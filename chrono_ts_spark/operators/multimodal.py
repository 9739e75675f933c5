"""Multimodal column plumbing (SURVEY.md §2.10 X9).

Images/audio/video ride through the engine as opaque ``binary``
columns plus a typed metadata struct — the schema pattern used by
public large-scale multimodal pipelines (and by Spark's own
``binaryFile`` source, which `read_binary_dir` wraps).

The actual media *decode* (JPEG→pixels, audio→PCM) requires codec
libraries not present in this container, so `decode_stub` is a
clearly-marked deterministic fake: feature vectors derived from the
bytes themselves. Everything around it — schema, Arrow batching via
``mapInPandas``, partition sizing, column pruning — is the real
production shape: swap `_fake_decode` for a PIL/ffmpeg call and the
pipeline is unchanged.

Scale notes: mapInPandas streams Arrow batches, so executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × median
blob size; keep blobs out of shuffle keys and aggregate features, not
bytes.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary column + metadata struct to documents.

    Stand-in for reading real media: payload bytes are the UTF-8 text
    (deterministic), metadata mirrors what a binaryFile-style source
    provides (modality, length, a fake sample rate / dimensions).
    """
    content = F.encode(F.col("text"), "UTF-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.length(content).alias("n_bytes"),
        modality.alias("modality"),
        F.lit("synthetic/v1").alias("format"),
    )
    return docs.select("doc_id", content.alias("content"), meta.alias("meta"))


def _fake_decode(blob: bytes, modality: str, dims: int = 8) -> list[float]:
    """DETERMINISTIC FAKE of the media decode step (see module doc).

    A real deployment decodes pixels/samples here; we derive a stable
    pseudo-feature from byte statistics so tests have exact
    expectations.
    """
    if not blob:
        return [0.0] * dims
    step = max(1, len(blob) // dims)
    return [
        float(sum(blob[i : i + step]) % 251) / 251.0
        for i in range(0, step * dims, step)
    ][:dims]


def decode_stub(df: DataFrame, dims: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow)."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["meta"].map(lambda m: m["modality"]),
                    "n_bytes": blobs.map(len).astype("int32"),
                    "checksum": blobs.map(lambda b: zlib.crc32(b)).astype("int64"),
                    "feature": blobs.combine(
                        pdf["meta"].map(lambda m: m["modality"]),
                        lambda b, m: _fake_decode(bytes(b), m, dims),
                    ),
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """documents → binary payload → Arrow-batched feature extraction."""
    return decode_stub(with_binary_payload(docs))


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S2/X9: real binary-file source (path, modtime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


# Public file signatures (magic bytes) → container format. Offsets are
# 1-based to match SQL substring semantics; 'mp4' matches 'ftyp' at
# byte offset 4. Codec-free: this is metadata-level sniffing, the step
# before any (stubbed) decode.
_MAGIC: list[tuple[str, int, str]] = [
    ("89504E47", 1, "png"),
    ("FFD8FF", 1, "jpeg"),
    ("47494638", 1, "gif"),
    ("52494646", 1, "riff"),
    ("25504446", 1, "pdf"),
    ("504B0304", 1, "zip"),
    ("1F8B", 1, "gzip"),
    ("4F5243", 1, "orc"),
    ("4F626A01", 1, "avro"),
    ("50415231", 1, "parquet"),
    ("66747970", 5, "mp4"),
]


def sniff_format(content):  # Column -> Column
    """Magic-byte format sniff, fully JVM-side (hex-prefix compares on
    the binary column — no Python boundary, no decode)."""
    expr = F.lit("unknown")
    for prefix, off, name in reversed(_MAGIC):
        nbytes = len(prefix) // 2
        cond = F.hex(F.substring(content, off, nbytes)) == F.lit(prefix)
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


BYTE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("fname", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("n_distinct_bytes", T.IntegerType()),
        T.StructField("top_byte", T.IntegerType()),
    ]
)


def byte_features(df: DataFrame) -> DataFrame:
    """Codec-free per-blob byte statistics via Arrow-batched mapInPandas:
    Shannon entropy (bits/byte, rounded 6), distinct byte count, and the
    most frequent byte (ties → smallest value, via argmax-first).

    Input columns: fname, format, content. The blob bytes never leave
    the executor that read them — only the fixed-width feature row
    shuffles, which is the 100 TB multimodal contract (module doc).
    """
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for fname, fmt, blob in zip(
                pdf["fname"], pdf["format"], pdf["content"]
            ):
                b = bytes(blob)
                counts = np.bincount(
                    np.frombuffer(b, dtype=np.uint8), minlength=256
                )
                n = len(b)
                if n:
                    p = counts[counts > 0] / n
                    ent = round(float(-(p * np.log2(p)).sum()), 6)
                    top = int(counts.argmax())
                    nd = int((counts > 0).sum())
                else:
                    ent, top, nd = 0.0, 0, 0
                rows.append((fname, fmt, n, ent, nd, top))
            yield pd.DataFrame(
                rows,
                columns=[
                    "fname", "format", "n_bytes",
                    "entropy", "n_distinct_bytes", "top_byte",
                ],
            )

    return df.select("fname", "format", "content").mapInPandas(
        extract, BYTE_FEATURE_SCHEMA
    )

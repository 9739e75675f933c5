"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode (the codec call itself is stubbed — see operators/multimodal)."""

from __future__ import annotations

import zlib

from chrono_ts_spark.operators.multimodal import (
    _fake_decode,
    multimodal_features,
    with_binary_payload,
)


def test_payload_schema(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine")], "doc_id long, text string"
    )
    p = with_binary_payload(docs)
    assert dict(p.dtypes) == {
        "doc_id": "bigint",
        "content": "binary",
        "meta": "struct<n_bytes:int,modality:string,format:string>",
    }


def test_feature_extraction_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine"), (2, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in multimodal_features(spark, docs).collect()}
    assert len(out) == 3
    for doc_id, text in [(0, "hello world"), (1, "spark engine"), (2, "")]:
        blob = text.encode()
        r = out[doc_id]
        assert r.n_bytes == len(blob)
        assert r.checksum == zlib.crc32(blob)
        assert [round(x, 5) for x in r.feature] == [
            round(x, 5) for x in _fake_decode(blob, r.modality)
        ]
    # modality assignment is doc_id mod 3
    assert out[0].modality == "image"
    assert out[1].modality == "audio"
    assert out[2].modality == "video"


# ---------------------------------------------------------------------------
# r6: byte-level features (format sniff + entropy/histogram) — planted
# blobs prove the magic table and tie-break conventions; the fixture
# files pin the query against an independent pure-Python recomputation.
# ---------------------------------------------------------------------------


def _py_byte_features(b: bytes):
    """Independent recomputation (same numpy ops as the operator)."""
    import numpy as np

    counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
    n = len(b)
    if not n:
        return 0.0, 0, 0
    p = counts[counts > 0] / n
    ent = round(float(-(p * np.log2(p)).sum()), 6)
    return ent, int((counts > 0).sum()), int(counts.argmax())


def test_sniff_format_planted(spark, tmp_path):
    from pyspark.sql import functions as F

    from chrono_ts_spark.operators.multimodal import (
        byte_features,
        read_binary_dir,
        sniff_format,
    )

    planted = {
        "a.png": b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,
        "b.jpg": b"\xff\xd8\xff\xe0" + b"JFIF" + b"\x01\x02" * 8,
        "c.gz": b"\x1f\x8b\x08\x00" + b"payload",
        "d.mp4": b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8,
        "e.bin": b"\x01\x02\x03\x04garbage",
        "f.parquet": b"PAR1" + b"cols" + b"PAR1",
    }
    for name, blob in planted.items():
        (tmp_path / name).write_bytes(blob)
    df = read_binary_dir(spark, str(tmp_path))
    named = df.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"),
        sniff_format(F.col("content")).alias("format"),
        "content",
    )
    out = {r.fname: r for r in byte_features(named).collect()}
    assert out["a.png"].format == "png"
    assert out["b.jpg"].format == "jpeg"
    assert out["c.gz"].format == "gzip"
    assert out["d.mp4"].format == "mp4"  # 'ftyp' at offset 4
    assert out["e.bin"].format == "unknown"
    assert out["f.parquet"].format == "parquet"
    for name, blob in planted.items():
        ent, nd, top = _py_byte_features(blob)
        r = out[name]
        assert (r.n_bytes, r.entropy, r.n_distinct_bytes, r.top_byte) == (
            len(blob), ent, nd, top,
        ), name
    # single-valued blob: zero entropy, modal byte = that byte
    assert out["a.png"].entropy > 0
    z = _py_byte_features(b"\x07" * 100)
    assert z == (0.0, 1, 7)
    # empty blob (binaryFile skips 0-byte files, so exercise the n==0
    # branch through an in-memory frame)
    from chrono_ts_spark.operators.multimodal import byte_features as _bf
    mem = spark.createDataFrame(
        [("z.dat", "unknown", bytearray(b""))],
        "fname string, format string, content binary",
    )
    zr = _bf(mem).collect()[0]
    assert (zr.n_bytes, zr.entropy, zr.n_distinct_bytes, zr.top_byte) == (0, 0.0, 0, 0)


def test_mm_byte_features_vs_ground_truth(spark):
    import glob
    import os

    from chrono_ts_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    reg = load_all()
    out = {r.fname: r for r in reg["mm_byte_features"].fn(spark, SF_SMOKE).collect()}
    files = sorted(glob.glob(os.path.join(SF_SMOKE, "*.parquet")))
    assert len(out) == len(files) == 10
    for path in files:
        blob = open(path, "rb").read()
        ent, nd, top = _py_byte_features(blob)
        r = out[os.path.basename(path)]
        assert r.format == "parquet"
        assert (r.n_bytes, r.entropy, r.n_distinct_bytes, r.top_byte) == (
            len(blob), ent, nd, top,
        ), path

"""Z-order (Morton) data layout for multi-dimensional file pruning.

Parquet pruning works on per-file min/max stats, which only help for
the physical sort key. Interleaving the bits of several quantized
columns into one z-value and range-partitioning + sorting on it gives
every interleaved column locality inside each file, so range
predicates on ANY of them skip most files — the standard layout
optimization for multi-dimensional scans (Delta/Iceberg expose the
same op as OPTIMIZE ZORDER BY / rewrite with a z-order strategy).

Everything is Catalyst expressions: quantization is
floor((x - min) * (2^bits - 1) / (max - min)) against a broadcast
one-row min/max aggregate, and the interleave is a fixed OR-chain of
shift/mask terms (bits × n_cols terms, whole-stage codegen). The write
path is repartitionByRange(z) + sortWithinPartitions(z): one range
shuffle (with Spark's reservoir-sampled bounds) regardless of how many
dimensions are interleaved.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(quantized: Sequence[Column], bits: int) -> Column:
    """OR together bit i of column j at output position i*n + j.

    Inputs must already be integers in [0, 2^bits); output fits a long
    as long as bits * len(quantized) <= 63.
    """
    n = len(quantized)
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols > 63 bits")
    z = F.lit(0).cast("bigint")
    for j, q in enumerate(quantized):
        qc = q.cast("bigint")
        for i in range(bits):
            z = z.bitwiseOR(
                F.call_function(
                    "shiftleft",
                    F.call_function("shiftright", qc, F.lit(i)).bitwiseAND(F.lit(1)),
                    F.lit(i * n + j),
                )
            )
    return z


def quantize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """floor((x - min) * (2^bits - 1) / (max - min)) as int; degenerate
    (max == min) and null inputs quantize to 0."""
    levels = float((1 << bits) - 1)
    q = F.floor(
        (col.cast("double") - cmin.cast("double"))
        * F.lit(levels)
        / (cmax.cast("double") - cmin.cast("double"))
    )
    return F.coalesce(
        F.when(cmax == cmin, F.lit(0)).otherwise(q), F.lit(0)
    ).cast("int")


def with_zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 8, out_col: str = "zval"
) -> DataFrame:
    """Append the z-value of `cols` (min/max-quantized to `bits` bits
    each) as `out_col`. One tiny global min/max aggregate broadcasts;
    the z-value itself is map-side."""
    bounds = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    j = df.crossJoin(F.broadcast(bounds))
    qs = [
        quantize(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits)
        for c in cols
    ]
    return j.withColumn(out_col, interleave_bits(qs, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    num_files: int = 16,
    bits: int = 8,
) -> None:
    """Rewrite `df` to parquet at `path` clustered by the z-order of
    `cols` — num_files range partitions sorted by z within each."""
    z = with_zvalue(df, cols, bits)
    (
        z.repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )

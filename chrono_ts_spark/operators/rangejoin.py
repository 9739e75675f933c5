"""Bucketed range / interval join (SURVEY.md §2 J5).

OSS Spark has no range-join optimization: a raw
``a.join(b, (b.ts > a.ts - Δ) & (b.ts <= a.ts))`` plans as a
BroadcastNestedLoopJoin / cartesian — O(|A|·|B|) comparisons, fatal at
scale. The standard fix (public pattern, used by e.g. Databricks'
range-join hint internally): quantize both sides to Δ-wide buckets,
equi-join on (key, bucket) where the probe side also matches the
neighbor bucket, then apply the exact range predicate as a residual
filter. Each probe row meets only the ~2 buckets that can contain
matches, so the join is a plain shuffled equi-join with ~2× fan-out,
fully AQE/skew-join eligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    lookback_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``build`` with ``build_ts`` in the half-open window
    (probe_ts - lookback, probe_ts] per key. Build-side columns keep
    their names; callers should pre-select/alias to avoid collisions.
    """
    w_us = int(lookback_seconds) * 1_000_000

    def bucket(col: str) -> F.Column:
        return (F.unix_micros(F.col(col)) / F.lit(w_us)).cast("long")

    # Probe row at bucket b can only match build rows in bucket b or b-1.
    p = probe.withColumn(
        "__rj_bucket", F.explode(F.array(bucket(probe_ts), bucket(probe_ts) - 1))
    )
    b = build.withColumn("__rj_bucket", bucket(build_ts))

    cond = [p["__rj_bucket"] == b["__rj_bucket"]] + [p[k] == b[k] for k in on]
    joined = p.join(b, cond, how)
    in_range = (F.unix_micros(b[build_ts]) > F.unix_micros(p[probe_ts]) - w_us) & (
        F.unix_micros(b[build_ts]) <= F.unix_micros(p[probe_ts])
    )
    if how == "inner":
        out = joined.filter(in_range)
    else:
        # Outer flavors: null out non-matching build columns post-join.
        raise NotImplementedError("use range_join_count or inner for now")
    return out.drop("__rj_bucket")


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    lookback_seconds: int,
    probe_id: str,
    count_alias: str = "n_matches",
) -> DataFrame:
    """LEFT-join flavor: per probe row, COUNT of build rows in window
    (zero-preserving). Aggregates away the fan-out immediately, so the
    shuffle output is |probe| rows regardless of match multiplicity.
    """
    w_us = int(lookback_seconds) * 1_000_000

    def bucket(col) -> F.Column:
        return (F.unix_micros(col) / F.lit(w_us)).cast("long")

    p = probe.withColumn(
        "__rj_bucket",
        F.explode(F.array(bucket(F.col(probe_ts)), bucket(F.col(probe_ts)) - 1)),
    )
    bsel = build.select(
        *[F.col(k).alias(f"__rj_{k}") for k in on],
        F.col(build_ts).alias("__rj_ts"),
    ).withColumn("__rj_bucket", bucket(F.col("__rj_ts")))

    cond = [p["__rj_bucket"] == bsel["__rj_bucket"]] + [
        p[k] == bsel[f"__rj_{k}"] for k in on
    ]
    joined = p.join(bsel, cond, "left")
    in_range = (
        F.unix_micros(F.col("__rj_ts")) > F.unix_micros(F.col(probe_ts)) - w_us
    ) & (F.unix_micros(F.col("__rj_ts")) <= F.unix_micros(F.col(probe_ts)))

    return (
        joined.groupBy(probe_id)
        .agg(F.count(F.when(in_range, F.lit(1))).alias(count_alias))
    )

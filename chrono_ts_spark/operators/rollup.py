"""Continuous-aggregate (hypertable rollup) maintenance.

The TSDB pattern: a time-bucket rollup is kept MATERIALIZED and
refreshed incrementally as new data lands, instead of recomputing the
aggregate over all history. The trick that makes refresh cheap and
exact is storing MERGEABLE partial states per bucket — count, decimal
sum (order-independent), min, max — rather than finalized averages:
merging a bucket's old state with the new batch's partial state is a
plain re-aggregation of two small rows, so a refresh touches only the
buckets present in the new batch, never the 100 TB of history.

At cluster scale the state table is partitioned by bucket date; a
refresh is: partial-aggregate the new batch (map-side combine), then
merge-aggregate against the state restricted to the touched buckets
(partition-pruned scan + one small shuffle). `finalize` derives the
user-facing columns (avg = sum/count) at read time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dec, time_bucket


def partial_state(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Mergeable per-(bucket, keys) state: n, decimal sum, min, max."""
    return (
        df.withColumn("bucket_ts", time_bucket(F.col(ts_col), bucket_seconds))
        .groupBy("bucket_ts", *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(value_col, 18, 6)).cast("decimal(38,6)").alias("sum_dec"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def merge_states(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two state tables (same schema). Exact because every field
    is mergeable: counts add, decimal sums add order-independently,
    min/max combine. At scale `a` would be pre-filtered to the buckets
    present in `b` (partition pruning on bucket_ts)."""
    return (
        a.unionByName(b)
        .groupBy("bucket_ts", *keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").cast("decimal(38,6)").alias("sum_dec"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """User-facing rollup from the state: n, sum, avg, min, max."""
    return state.select(
        "bucket_ts",
        *keys,
        F.col("n"),
        F.col("sum_dec").cast("double").alias("sum_v"),
        (F.col("sum_dec").cast("double") / F.col("n").cast("double")).alias("avg_v"),
        "min_v",
        "max_v",
    )

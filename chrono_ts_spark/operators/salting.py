"""Skew mitigation by key salting (SURVEY.md §4 "skew handling",
docs/scale.md).

AQE's skew-join splitting handles storage-level skew, but a *hot
aggregation key* (one event_type being 90% of a 100 TB stream) still
funnels one reducer. Salted two-stage aggregation shards each key into
`salt` sub-keys for the partial aggregate, then combines the shards —
the classic pattern, expressed so the final result is bit-identical to
the unsalted aggregate (partial states are exact: decimal sums, counts,
min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt: int,
    sums_decimal: dict[str, tuple[int, int]] | None = None,
    count_alias: str | None = "n",
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    sums_decimal: {col: (precision, scale)} → decimal-exact sums named
    ``sum_<col>`` (double). count/min/max likewise re-associate exactly,
    so salting cannot change any output bit.
    """
    sums_decimal = sums_decimal or {}
    min_cols = min_cols or []
    max_cols = max_cols or []

    # Salt must be DETERMINISTIC per row: monotonically_increasing_id
    # changes under task retry/speculation, which loses or double-counts
    # rows when a lost map output is recomputed (SPARK-23207 class).
    # Content-hash of the full row is stable across retries; duplicate
    # rows sharing a salt only narrows spreading for pathological
    # all-identical-row data.
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )

    partial_aggs: list[Column] = []
    final_aggs: list[Column] = []
    for c, (p, s) in sums_decimal.items():
        partial_aggs.append(F.sum(F.col(c).cast(f"decimal({p},{s})")).alias(f"__ps_{c}"))
        # widen by salt-count digits so the combine can't overflow
        final_aggs.append(
            F.sum(F.col(f"__ps_{c}")).cast("double").alias(f"sum_{c}")
        )
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__pc"))
        final_aggs.append(F.sum("__pc").alias(count_alias))
    for c in min_cols:
        partial_aggs.append(F.min(c).alias(f"__pmin_{c}"))
        final_aggs.append(F.min(f"__pmin_{c}").alias(f"min_{c}"))
    for c in max_cols:
        partial_aggs.append(F.max(c).alias(f"__pmax_{c}"))
        final_aggs.append(F.max(f"__pmax_{c}").alias(f"max_{c}"))

    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """Skew-safe equi-join: the big side's hot keys shard into `salt`
    sub-keys and the SMALL side replicates salt× so every shard still
    finds its match — the classic hot-key join fix when the small side
    is too big (or the planner too conservative) to broadcast.

    The salt is deterministic — pmod(xxhash64(all big columns), salt) —
    never rand(): a task retry re-salts identically, so no row can
    migrate shards mid-job (the correctness hazard of random salting).
    Identical duplicate rows share a shard, which only matters for
    spread, never for results: each big row matches exactly the one
    replica carrying its salt, so the output is row-identical to the
    plain join. `force_shuffle=True` adds a SHUFFLE_HASH hint so the
    salted Exchange actually materializes at fixture scale (a 15-row
    dim would otherwise broadcast and the salt would be a no-op).
    """
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti",
        "cross",
    ):
        # right/full joins preserve the REPLICATED small side: an
        # unmatched small row would surface `salt` times null-extended
        # (r7 review) — refuse instead of silently multiplying rows
        raise ValueError(
            f"salted_join cannot preserve the replicated small side: "
            f"how={how!r} would emit unmatched small rows salt times; "
            "use a big-side-preserving join type"
        )
    bsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)
    ).cast("int")
    big2 = big.withColumn("__salt", bsalt)
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt)])).alias("__salt")
    small2 = small.select("*", salts)
    if force_shuffle:
        small2 = small2.hint("SHUFFLE_HASH")
    return big2.join(small2, [*on, "__salt"], how).drop("__salt")

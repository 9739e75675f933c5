"""Gap-fill + LOCF + linear interpolation (SURVEY.md §2 W5).

Emits one row per (series key × fixed-width bucket) over a closed
range, whether or not data arrived in that bucket, then fills missing
values by last-observation-carried-forward and/or linear interpolation
between the surrounding observations.

Plan shape: the bucket spine is ``sequence() + explode`` crossed with
the distinct key set — both lazily generated, never collected. Filling
uses two per-key ordered windows (forward + backward carry). At scale:
one shuffle for the actuals aggregation, one for the spine join (the
spine side is tiny per key and broadcast-able when the key set is
small), windows reuse the join's partitioning when
``spark.sql.shuffle.partitions`` aligns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import time_bucket


def gapfill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    start: str,
    end: str,
    agg: str = "avg",
    fixed_point_scale: int | None = None,
) -> DataFrame:
    """Return (keys…, bucket_ts, value, value_locf, value_interp).

    ``value`` is the per-bucket aggregate (null for empty buckets);
    ``value_locf`` carries the last non-null forward; ``value_interp``
    linearly interpolates between surrounding non-null buckets (null
    before the first / after the last observation). ``start``/``end``
    are inclusive bucket-start timestamps, e.g. '2024-01-01 00:00:00'.

    ``fixed_point_scale`` (r15, opt-in): compute avg/sum with the int64
    fixed-point twins (functions.fsum/favg) at this decimal scale —
    bit-identical to the decimal forms ONLY when every value is exactly
    representable at that scale (contract + equivalence argument in
    functions/__init__.py); ~2x cheaper per aggregated row. Default
    None keeps the decimal path for arbitrary value domains.
    """
    from ..functions import davg, dsum, favg, fsum

    from datetime import datetime, timezone

    for name, s in (("start", start), ("end", end)):
        epoch = (
            datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp()
        )
        if int(epoch) % int(bucket_seconds) != 0:
            raise ValueError(
                f"{name}={s!r} is not aligned to bucket_seconds={bucket_seconds}: "
                "the spine would never match the epoch-aligned actuals"
            )

    b = F.col("bucket_ts")
    # avg/sum use the decimal-exact forms so results are aggregation-order
    # independent (oracle hash-comparable); min/max/count are exact anyway.
    if fixed_point_scale is not None and agg in ("avg", "sum"):
        s = fixed_point_scale
        aggfn = {"avg": lambda c: favg(c, s), "sum": lambda c: fsum(c, s)}[agg]
    else:
        aggfn = {
            "avg": davg, "sum": dsum, "min": F.min, "max": F.max, "count": F.count,
        }[agg]

    actual = (
        df.filter(
            (F.col(ts_col) >= F.lit(start).cast("timestamp"))
            & (
                F.col(ts_col)
                < F.lit(end).cast("timestamp") + F.expr(f"INTERVAL {bucket_seconds} SECONDS")
            )
        )
        .groupBy(*keys, time_bucket(ts_col, bucket_seconds).alias("bucket_ts"))
        .agg(aggfn(value_col).alias("value"))
    )

    spine_ts = F.explode(
        F.sequence(
            F.lit(start).cast("timestamp"),
            F.lit(end).cast("timestamp"),
            F.expr(f"interval {bucket_seconds} seconds"),
        )
    ).alias("bucket_ts")
    spine = df.select(*keys).distinct().select("*", spine_ts)

    filled = spine.join(actual, on=[*keys, "bucket_ts"], how="left")

    idx = F.unix_micros(b)
    w_fwd = Window.partitionBy(*keys).orderBy(b).rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = Window.partitionBy(*keys).orderBy(b).rowsBetween(0, Window.unboundedFollowing)

    v = F.col("value")
    obs_idx = F.when(v.isNotNull(), idx)
    prev_v = F.last(v, ignorenulls=True).over(w_fwd)
    prev_t = F.last(obs_idx, ignorenulls=True).over(w_fwd)
    next_v = F.first(v, ignorenulls=True).over(w_bwd)
    next_t = F.first(obs_idx, ignorenulls=True).over(w_bwd)

    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v
            + (next_v - prev_v)
            * ((idx - prev_t).cast("double") / (next_t - prev_t).cast("double")),
        )
    )

    return filled.select(
        *keys,
        b,
        v,
        prev_v.alias("value_locf"),
        interp.alias("value_interp"),
    )

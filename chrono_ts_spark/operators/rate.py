"""Per-series derivative / rate / delta with counter-reset handling
(SURVEY.md §2 W4) — the Prometheus/TSDB `rate()` semantics.

delta_i   = value_i - value_{i-1}            (per key, time order)
reset fix = value_i when delta_i < 0          (counter restarted)
rate_i    = fixed_delta / (ts_i - ts_{i-1})   (per second)

Pure lag() over a per-key ordered window — one shuffle on the key, all
arithmetic stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: list[str] | None = None,
    counter_reset: bool = True,
) -> DataFrame:
    """Append delta / dt_seconds / rate columns; first row per key is
    dropped (no predecessor), zero-dt rows are dropped (duplicate ts)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)

    v = F.col(value_col)
    # Materialize the window expressions first: Spark disallows window
    # functions inside WHERE, so filter on the projected columns.
    staged = df.withColumn("__prev_v", F.lag(v).over(w)).withColumn(
        "__dt_us", F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    )
    delta = v - F.col("__prev_v")
    fixed = F.when(delta < 0, v).otherwise(delta) if counter_reset else delta
    dt_s = F.col("__dt_us").cast("double") / F.lit(1_000_000.0)

    return (
        staged.filter(F.col("__prev_v").isNotNull() & (F.col("__dt_us") > 0))
        .withColumn("delta", fixed)
        .withColumn("dt_seconds", dt_s)
        .withColumn("rate_per_s", fixed / dt_s)
        .drop("__prev_v", "__dt_us")
    )

"""Batch sessionization (SURVEY.md §2 ST4's batch analog).

A session is a maximal run of events per key where consecutive gaps are
<= ``gap_seconds``. Classic gaps-and-islands: flag rows whose gap from
the predecessor exceeds the threshold, running-sum the flags to get a
session index. Two window passes over one per-key shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Append a ``session_id`` column (0-based per key, time order)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(new_session).over(run) - F.lit(1))

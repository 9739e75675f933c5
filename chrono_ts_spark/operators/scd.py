"""Slowly-changing-dimension Type 2 build from a change log.

Classic warehouse maintenance op: given per-key attribute observations
over time, produce versioned dimension rows with
[effective_from, effective_to) validity intervals, collapsing
consecutive observations whose tracked attributes did not change.

Plan shape: one shuffle. Both window passes (the lag-based change
detector and the lead/row_number versioning) partition by the same
keys with the same ordering, and the in-between filter preserves sort
order and partitioning, so Catalyst plans a single Exchange + Sort
feeding two Window operators. At 100 TB the cost is one shuffle of
(keys, attrs, ts) — no payload duplication, no join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    df: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Versioned SCD2 rows: one row per (key, attribute-change run).

    Columns out: keys + attrs + effective_from, effective_to (null for
    the open current version), version (1-based per key), is_current
    (int 0/1). Change detection is null-safe on the struct of tracked
    attrs; pass `tiebreak` columns to make ordering total when ts ties
    are possible (otherwise tie order — and thus which observation
    starts a run — is nondeterministic).
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    attr = F.struct(*[F.col(a) for a in attrs])
    changed = ~F.lag(attr).over(w).eqNullSafe(attr)
    runs = df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    return runs.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w).alias("effective_to"),
        F.row_number().over(w).cast("int").alias("version"),
        F.lead(ts_col).over(w).isNull().cast("int").alias("is_current"),
    )

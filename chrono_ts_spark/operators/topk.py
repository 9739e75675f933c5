"""Top-k per group (SURVEY.md §2 O3) — "top series" in TSDB terms.

row_number over a per-group ordered window, filtered to <= k. Catalyst
plans this as a single shuffle + per-partition sort; with AQE the
partition count adapts to data volume. Callers MUST pass a total order
(include a unique tiebreak column) or the selected rows are
nondeterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_alias: str = "rnk",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )

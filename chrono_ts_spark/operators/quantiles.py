"""Exact interpolated quantiles without the Percentile buffer.

Spark's exact ``F.percentile`` is a TypedImperativeAggregate whose
buffer holds each group's ENTIRE value multiset in a per-group
OpenHashMap through the merge phase. For bounded groups that is fine;
for data-sized groups (three return flags over all of lineitem, a hot
hour bucket, 160M slope micro-units per probe) it is an OOM waiting
for enough concurrent heap pressure — found by the r9 10M probe on
ts_theil_sen_windowed (docs/scale.md "the exact-Percentile buffer").

``count_table_quantiles`` is the scalable exact form:

1. group to (keys, value) COUNTS — map-side combinable, O(distinct
   values) state instead of O(rows);
2. one cumulative-count window ordered by value within each key;
3. each requested quantile p needs the values at the two 0-indexed
   ranks floor(p*(n-1)) and ceil(p*(n-1)); a count row covers rank r
   iff cum - c <= r < cum;
4. interpolate lo + (hi - lo) * frac in doubles — quantile_cont's op
   order, and within 1 ulp of Spark's Percentile (call sites keep the
   r6 rule of rounding percentile OUTPUTS to 6dp where the oracle
   compares them).

Every step is satisfied by hash partitioning on the group keys (the
(keys, value) groupBy, the per-key window, and the final groupBy all
accept ClusteredDistribution with keys ⊆ clustering), so a query that
was already partitioned by the keys gains NO new shuffle, and the
window sort spills to disk where the hashmap buffer could only grow.

Known bound (r9 50× relational probe): with FEW groups the cumulative
window's parallelism collapses to the group count — three returnflag
groups over 30M lineitem rows ran the window on 3 tasks (21.5 s;
correct, memory-flat, linear, but not width-parallel). Where that
matters the swaps are percentile_approx (t-digest, fully parallel) or
a two-pass range-bucketed exact scan (per-range counts → locate each
target rank's range → rescan only those ranges).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_table_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    ps: Sequence[float],
    names: Sequence[str],
    n_name: str | None = None,
) -> DataFrame:
    """Exact interpolated quantiles of ``col`` per ``keys`` group.

    Returns one row per group: [*keys, (n_name,)? *names]. Nulls in
    ``col`` are skipped (F.percentile's semantics). ``n_name``, when
    given, adds the non-null value count as a bigint column. One
    deliberate edge difference vs F.percentile: a group whose values
    are ALL null disappears here (no count rows survive the filter),
    where percentile would keep it with null quantiles — callers that
    must retain empty groups re-join against the key table.
    """
    if len(ps) != len(names):
        raise ValueError("ps and names must pair up")
    keys = list(keys)
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    wk = Window.partitionBy(*keys)
    wm = wk.orderBy(col)
    cum = F.sum("__c").over(wm.rowsBetween(Window.unboundedPreceding, 0))
    base = counts.select(
        *keys,
        col,
        "__c",
        cum.alias("__cum"),
        F.sum("__c").over(wk).alias("__n"),
    )
    prev = F.col("__cum") - F.col("__c")
    picked = [
        F.max(F.col("__n")).alias("__n"),
    ]
    for i, p in enumerate(ps):
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        picked.append(
            F.max(F.when((prev <= lo) & (lo < F.col("__cum")), F.col(col))).alias(
                f"__lo{i}"
            )
        )
        picked.append(
            F.max(F.when((prev <= hi) & (hi < F.col("__cum")), F.col(col))).alias(
                f"__hi{i}"
            )
        )
    agg = base.groupBy(*keys).agg(*picked)
    out = list(keys)
    if n_name is not None:
        out.append(F.col("__n").cast("bigint").alias(n_name))
    for i, (p, name) in enumerate(zip(ps, names)):
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        frac = pos - F.floor(pos).cast("double")
        dlo = F.col(f"__lo{i}").cast("double")
        dhi = F.col(f"__hi{i}").cast("double")
        out.append((dlo + (dhi - dlo) * frac).alias(name))
    return agg.select(*out)

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
``range_bucketed_quantiles`` below (r10): the two-pass exact scan —
per-(key, range-bucket) counts locate each target rank's bucket, then
a second scan resolves the exact value inside only the ~2·|ps| needed
buckets per key. Every heavy stage (both scans, both aggregations) is
width-parallel at ANY group count; the only per-key-serial work runs
over ≤ n_buckets count rows per key.
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


def range_bucketed_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    ps: Sequence[float],
    names: Sequence[str],
    n_name: str | None = None,
    n_buckets: int = 4096,
) -> DataFrame:
    """Exact interpolated quantiles via a two-pass range-bucketed scan
    — the FEW-GROUPS swap for :func:`count_table_quantiles` (r10,
    closing its documented parallelism bound: with k groups that
    helper's cumulative window runs on k tasks, 3 tasks over 30M
    lineitem rows at the r9 50x probe).

    Pass 1: per-key (min, max, n) extents, then per-(key, bucket)
    counts where bucket = floor((v - min) / (max - min) * B) clamped
    to B-1 — a plain map-side-combinable hash aggregate, width-
    parallel over every input partition regardless of group count.
    A cumulative sum over the <= B count rows per key locates, for
    each target 0-indexed rank floor(p*(n-1)) / ceil(p*(n-1)), the
    bucket containing it and the count below that bucket.

    Pass 2: rescan, keep only rows in a needed bucket (broadcast
    semi-structure join — <= 2*|ps| buckets per key, so ~2|ps|/B of
    the data), build the per-needed-bucket value count table, and
    pick the value at each rank's bucket-local offset. Interpolation
    then mirrors count_table_quantiles / quantile_cont exactly
    (lo + (hi - lo) * frac on double-cast EXACT data values), so the
    two helpers are drop-in interchangeable and share oracles.

    Width-parallelism: both scans and both heavy aggregations
    distribute over all input partitions; the only group-count-bound
    stages run over <= B count rows (pass 1 window) or ~n/B data rows
    per needed bucket (pass 2 window). Memory: no per-group multiset
    is ever buffered (the F.percentile hazard, docs/scale.md); state
    is O(distinct values within needed buckets).

    Contract: the per-key extent table is broadcast, so this is the
    few-/bounded-group form (count_table_quantiles remains the
    many-group form — there the group count IS the width). Bucketing
    casts values to double, monotone for the fixture domains (double,
    bigint < 2^53); null VALUES are skipped and all-null groups drop,
    exactly as count_table_quantiles. Null KEYS are kept (r11, ADVICE):
    every internal join runs on one struct(*keys) column — Spark's
    struct equality treats null fields as equal — so null-keyed groups
    survive exactly as they do under count_table_quantiles' plain
    groupBy, keeping the drop-in contract on nullable keys too.
    """
    if len(ps) != len(names):
        raise ValueError("ps and names must pair up")
    keys = list(keys)
    kcol = F.struct(*keys).alias("__k")
    vals = df.select(kcol, F.col(col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    ext = vals.groupBy("__k").agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    dv = F.col("__v").cast("double")
    mnd = F.col("__mn").cast("double")
    mxd = F.col("__mx").cast("double")
    bucket = (
        F.when(mxd == mnd, F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1).cast("bigint"),
                F.floor((dv - mnd) / (mxd - mnd) * F.lit(float(n_buckets))),
            )
        )
        .alias("__b")
    )
    tagged = vals.join(F.broadcast(ext), "__k").select("__k", "__v", bucket)
    # -- pass 1: bucket histogram + rank location (width-parallel agg;
    #    the per-key window below it covers <= n_buckets rows/key) --
    cnt = tagged.groupBy("__k", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    wk = Window.partitionBy("__k").orderBy("__b")
    bcum = cnt.select(
        "__k",
        "__b",
        "__c",
        F.sum("__c")
        .over(wk.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum"),
    )
    rank_exprs = []
    for p in ps:
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        rank_exprs += [F.floor(pos), F.ceil(pos)]
    targets = ext.select(
        "__k",
        F.explode(F.array_distinct(F.array(*rank_exprs))).alias("__rk"),
    )
    located = (
        F.broadcast(targets)
        .join(bcum, "__k")
        .filter(
            (F.col("__cum") - F.col("__c") <= F.col("__rk"))
            & (F.col("__rk") < F.col("__cum"))
        )
        .select(
            "__k", "__rk", "__b", (F.col("__cum") - F.col("__c")).alias("__below")
        )
    )
    needed = located.select("__k", "__b", "__below").distinct()
    # -- pass 2: rescan only the needed buckets, resolve exact values
    #    at the bucket-local offsets --
    hit = tagged.join(F.broadcast(needed), ["__k", "__b"])
    loc = hit.groupBy("__k", "__b", "__below", "__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c2")
    )
    w2 = Window.partitionBy("__k", "__b").orderBy("__v")
    loc2 = loc.select(
        "__k",
        "__b",
        "__below",
        "__v",
        "__c2",
        F.sum("__c2")
        .over(w2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum2"),
    )
    lrk = F.col("__rk") - F.col("__below")
    at_rank = (
        loc2.join(
            F.broadcast(located.select("__k", "__b", "__rk")), ["__k", "__b"]
        )
        .filter((F.col("__cum2") - F.col("__c2") <= lrk) & (lrk < F.col("__cum2")))
        .select("__k", "__rk", "__v")
    )
    m = at_rank.groupBy("__k").agg(
        F.map_from_entries(F.collect_list(F.struct("__rk", "__v"))).alias("__m")
    )
    res = ext.join(m, "__k")
    out: list = [F.col("__k").getField(k).alias(k) for k in keys]
    if n_name is not None:
        out.append(F.col("__n").cast("bigint").alias(n_name))
    for p, name in zip(ps, names):
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        frac = pos - F.floor(pos).cast("double")
        dlo = F.element_at(F.col("__m"), F.floor(pos)).cast("double")
        dhi = F.element_at(F.col("__m"), F.ceil(pos)).cast("double")
        out.append((dlo + (dhi - dlo) * frac).alias(name))
    return res.select(*out)


def range_bucketed_weighted_median(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    w: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """Lower/upper WEIGHTED medians of integer ``col`` under integer
    weights ``w`` per ``keys`` group, via the same two-pass
    range-bucketed scan as :func:`range_bucketed_quantiles` (r10) —
    weight sums replace counts everywhere, so every heavy stage stays
    width-parallel at any group count and nothing ever materializes a
    per-row cumulative weight (the banded-prefix-sum form this
    replaces in rel_weighted_median carried a running sum across ALL
    rows: correct, linear, but 86 s at the 100x probe for THREE
    groups).

    Definitions (integer cross-multiplied, no division):
      lo = min v such that 2 * W(<= v) >= W_total
      hi = min v such that 2 * W(<= v) >  W_total
    Value-level cumulative weights suffice: within a run of equal
    values the first row to cross and the run's end-of-run cumulative
    cross at the same value, so the per-row and per-value definitions
    agree exactly — the plain-window oracle proves it.

    Returns [*keys, __tw (bigint total weight), __lo, __hi (col's
    type)]. Assumes non-negative weights (zero-weight rows cannot
    shift a crossing); null values are skipped. Null KEYS are kept
    (r11, ADVICE): internal joins run on one struct(*keys) column
    whose struct equality treats null fields as equal, matching
    plain-groupBy semantics on nullable keys.
    """
    keys = list(keys)
    kcol = F.struct(*keys).alias("__k")
    vals = df.select(
        kcol, F.col(col).alias("__v"), F.col(w).cast("bigint").alias("__w")
    ).filter(F.col("__v").isNotNull())
    ext = vals.groupBy("__k").agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.sum("__w").cast("bigint").alias("__tw"),
    )
    dv = F.col("__v").cast("double")
    mnd = F.col("__mn").cast("double")
    mxd = F.col("__mx").cast("double")
    bucket = (
        F.when(mxd == mnd, F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1).cast("bigint"),
                F.floor((dv - mnd) / (mxd - mnd) * F.lit(float(n_buckets))),
            )
        )
        .alias("__b")
    )
    tagged = vals.join(F.broadcast(ext), "__k").select(
        "__k", "__v", "__w", "__tw", bucket
    )
    cnt = tagged.groupBy("__k", "__b").agg(
        F.sum("__w").cast("bigint").alias("__c"),
        F.max("__tw").alias("__tw"),
    )
    wk = Window.partitionBy("__k").orderBy("__b")
    bcum = cnt.select(
        "__k",
        "__b",
        "__c",
        "__tw",
        F.sum("__c")
        .over(wk.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum"),
    )

    def resolve(strict: bool, out_name: str) -> DataFrame:
        crossed = (
            (F.col("__cum") * 2 > F.col("__tw"))
            if strict
            else (F.col("__cum") * 2 >= F.col("__tw"))
        )
        target = (
            bcum.filter(crossed)
            .groupBy("__k")
            .agg(
                F.min("__b").alias("__bt"),
                F.min_by(F.col("__cum") - F.col("__c"), F.col("__b")).alias(
                    "__below"
                ),
            )
        )
        hit = (
            tagged.join(F.broadcast(target), "__k")
            .filter(F.col("__b") == F.col("__bt"))
            .select("__k", "__v", "__w", "__tw", "__below")
        )
        loc = hit.groupBy("__k", "__below", "__tw", "__v").agg(
            F.sum("__w").cast("bigint").alias("__c2")
        )
        w2 = Window.partitionBy("__k").orderBy("__v")
        loc2 = loc.select(
            "__k",
            "__v",
            "__tw",
            (
                F.col("__below")
                + F.sum("__c2").over(w2.rowsBetween(Window.unboundedPreceding, 0))
            ).alias("__cw"),
        )
        crossed2 = (
            (F.col("__cw") * 2 > F.col("__tw"))
            if strict
            else (F.col("__cw") * 2 >= F.col("__tw"))
        )
        return (
            loc2.filter(crossed2)
            .groupBy("__k")
            .agg(F.min("__v").alias(out_name))
        )

    lo = resolve(False, "__lo")
    hi = resolve(True, "__hi")
    return (
        ext.select("__k", "__tw")
        .join(lo, "__k")
        .join(hi, "__k")
        .select(
            *[F.col("__k").getField(k).alias(k) for k in keys],
            "__tw",
            "__lo",
            "__hi",
        )
    )

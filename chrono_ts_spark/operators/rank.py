"""Banded global rank — a total rank over one numeric column WITHOUT a
single-partition window.

The registry plan audit forbids partition-less windows (the classic
100 TB scale-killer: the whole relation funnels through one reducer).
This helper produces the identical dense row_number a global window
would, scalably:

1. band rows by the DIGIT COUNT of the (non-negative integer) rank
   key — integer-exact on any engine, and band(a) > band(b) implies
   a > b, so bands are totally ordered and internally contiguous;
2. rank within each band with a PARTITIONED window (deterministic
   tiebreak columns supplied by the caller);
3. add cross-band offsets from a theta join over the tiny per-band
   count table (at most ~19 bands for a bigint key — broadcast).

First used inline by doc_zipf_fit (text.py); factored here for reuse
(rel_rfm_segments ranks three metrics). ~19 bands keeps every reducer
bounded by the largest band, which for real-valued metrics is a
constant fraction of n — the skew guard is the banding itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _digit_band(key: str) -> Column:
    """Digit-count band of a NON-NEGATIVE integral key, guarded loudly.

    band(a) > band(b) ⇒ a > b only holds for non-negative INTEGRAL
    keys: a negative key gains a '-' digit (band('-5')=2 > band('7')=1)
    and a fractional key's string length tracks decimal digits, not
    magnitude (band('9.555')=5 > band('11.5')=4) — either silently
    corrupts every rank/quantile built on the banding (ADVICE r6 +
    r7 review). Rather than trust the callers' fixtures, the band
    expression embeds assert_true, so a violating dataset fails the job
    with this message instead of returning wrong order statistics.
    NULL keys do not fire the guard; they keep the pre-existing
    semantics (band NULL, so the row is excluded by the band join).
    """
    guard = F.assert_true(
        F.col(key).isNull()
        | ((F.col(key) >= 0) & (F.col(key) == F.floor(F.col(key)))),
        F.lit(
            f"digit-count banding requires a non-negative INTEGRAL key "
            f"'{key}' (negative values invert band order; fractional "
            "values make string length non-monotonic); scale to "
            "non-negative fixed point first"
        ),
    )
    # digit count via a decimal(38,0) render: a DOUBLE key >= 1e7
    # casts to scientific notation ('1.0E7', length 5 < len('9999999.0'))
    # under a plain string cast, inverting band order for large integral
    # doubles (r7 review); the decimal cast always renders plain digits
    # and is exact for the integral values the guard admits
    return F.when(
        guard.isNull(),
        F.length(F.col(key).cast("decimal(38,0)").cast("string")).cast("bigint"),
    )


def global_rank(
    df: DataFrame,
    key: str,
    tiebreak: list[str],
    *,
    ascending: bool = True,
    out: str = "r",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Append column ``out`` = 1-based global row_number by
    (``key`` asc/desc, then ``tiebreak`` asc), with no global window.

    ``key`` must be a non-negative integral column (cents, counts,
    day numbers); callers scale doubles to fixed point first.
    ``partition_by`` restarts the rank per group (per-year quartiles):
    bands become (group, digit-band), offsets join on group equality.
    """
    pby = list(partition_by or [])
    banded = df.withColumn("__band", _digit_band(key))
    key_order: Column = F.col(key).asc() if ascending else F.col(key).desc()
    w_in = Window.partitionBy(*pby, "__band").orderBy(
        key_order, *[F.col(c).asc() for c in tiebreak]
    )
    within = banded.withColumn("__rw", F.row_number().over(w_in))
    bn = banded.groupBy(*pby, "__band").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    # offset(b) = total rows in bands strictly ordered before b
    before = F.col("__o_band") < F.col("__band") if ascending else (
        F.col("__o_band") > F.col("__band")
    )
    other = bn.select(
        *[F.col(c).alias(f"__o_{c}") for c in pby],
        F.col("__band").alias("__o_band"),
        F.col("__cnt").alias("__o_cnt"),
    )
    cond = before
    for c in pby:
        cond = cond & (F.col(f"__o_{c}") == F.col(c))
    off = (
        bn.select(*pby, "__band")
        .join(F.broadcast(other), cond, "left")
        .groupBy(*pby, "__band")
        .agg(F.coalesce(F.sum("__o_cnt"), F.lit(0)).cast("bigint").alias("__off"))
    )
    return (
        within.join(F.broadcast(off), [*pby, "__band"])
        .withColumn(out, (F.col("__off") + F.col("__rw")).cast("bigint"))
        .drop("__band", "__rw", "__off")
    )


def banded_prefix_sum(
    df: DataFrame,
    key: str,
    tiebreak: list[str],
    value: str,
    *,
    ascending: bool = True,
    out: str = "cum",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Append column ``out`` = running SUM of ``value`` over the global
    (``key``, ``tiebreak``) order — inclusive of the current row — with
    no global window: within-band running sums plus a broadcast
    theta-join of whole-band totals (the same decomposition as
    global_rank, applied to a sum instead of a count).

    The Pareto/ABC cumulative-share primitive: at scale a global
    cumulative sum is otherwise a single-partition sort.

    ``partition_by`` restarts the running sum per group (weighted
    medians per category): bands become (group, digit-band) and the
    offset join adds an equality condition on the group columns.
    """
    pby = list(partition_by or [])
    banded = df.withColumn("__band", _digit_band(key))
    key_order: Column = F.col(key).asc() if ascending else F.col(key).desc()
    w_in = (
        Window.partitionBy(*pby, "__band")
        .orderBy(key_order, *[F.col(c).asc() for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = banded.withColumn("__run", F.sum(value).over(w_in))
    bt = banded.groupBy(*pby, "__band").agg(F.sum(value).alias("__tot"))
    before = F.col("__o_band") < F.col("__band") if ascending else (
        F.col("__o_band") > F.col("__band")
    )
    other = bt.select(
        *[F.col(c).alias(f"__o_{c}") for c in pby],
        F.col("__band").alias("__o_band"),
        F.col("__tot").alias("__o_tot"),
    )
    cond = before
    for c in pby:
        cond = cond & (F.col(f"__o_{c}") == F.col(c))
    off = (
        bt.select(*pby, "__band")
        .join(F.broadcast(other), cond, "left")
        .groupBy(*pby, "__band")
        .agg(F.coalesce(F.sum("__o_tot"), F.lit(0)).alias("__off"))
    )
    return (
        within.join(F.broadcast(off), [*pby, "__band"])
        .withColumn(out, F.col("__off") + F.col("__run"))
        .drop("__band", "__run", "__off")
    )

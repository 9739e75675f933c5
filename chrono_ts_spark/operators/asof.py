"""As-of join (SURVEY.md §2 J6) — the TSDB signature temporal lookup.

Semantics (matching DuckDB's ``ASOF LEFT JOIN`` with ``l.ts >= r.ts``):
for every left row, attach the right row with the greatest ``r.ts``
satisfying ``r.ts <= l.ts`` within the same key group; equal timestamps
match; left rows with no earlier right row get nulls.

Tie divergence vs other engines: when several right rows share the same
(key, ts), this join deterministically attaches the payload-struct
MAXIMUM (lexicographic over ``right_cols + [right_ts]``, non-NULL above
NULL), so results are stable across shuffles and retries. DuckDB's
``ASOF JOIN`` (and pandas ``merge_asof``) pick an *unspecified* row in
that case — an oracle written as a bare ASOF JOIN is only comparable on
tie-free fixtures. The oracled queries in queries/timeseries.py
therefore pre-deduplicate the right side per (key, ts) with
``row_number() ... ORDER BY value DESC NULLS LAST`` — the exact mirror
of the struct-max rule — so a future fixture with duplicate
(user_id, ts) click rows cannot produce a flaky mismatch.

Implementation: the union-and-carry-forward pattern. Both sides are
unioned with a side tag, sorted per key by (ts, side), and the last
non-null right payload is carried forward with an unbounded-preceding
window. Cost model at scale: ONE shuffle of (|L|+|R|) rows on the key
— no range explosion, no broadcast requirement, no skew beyond what the
key distribution already has. This beats a naive
``join + filter + row_number`` (which materializes every candidate
pair) by orders of magnitude when right-side history is long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_SEQ = "__asof_seq"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join of ``left`` to ``right`` on key cols ``on``.

    direction='backward' (default): greatest r.ts <= l.ts.
    direction='forward': smallest r.ts >= l.ts (the carry-forward
    window simply runs in reverse time order).
    direction='nearest': whichever of those two candidates has the
    smaller |gap|; exact ties pick the backward row (pandas
    ``merge_asof(direction='nearest')`` semantics — pinned by the
    equivalence test). Costs a second window pass over the SAME
    key-partitioning: still one shuffle, two per-partition sorts.
    right_cols: right payload columns to attach (default: all except
    key/ts). Attached as ``<name><suffix>`` plus ``<right_ts><suffix>``.
    tolerance_seconds: if set, matches farther than this are nulled out
    (same as pandas ``merge_asof(tolerance=...)``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {right_ts}]

    payload = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
        *[F.col(c) for c in left.columns if c not in set(on) | {left_ts}],
        F.col(left_ts),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in set(on) | {left_ts}
        ],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
    )

    unioned = l_tag.unionByName(r_tag)
    # Carry the whole right payload as ONE struct: carrying columns
    # independently would stitch together values from different right
    # rows whenever a payload column is NULL (the matched row's NULL
    # would be "filled" by an older row's value). The struct is non-null
    # exactly when a right row exists, so one carry preserves row unity.
    row_struct = F.when(
        F.col(_SIDE) == 0, F.struct(*[F.col(c) for c in payload])
    )

    # Tiebreak among right rows sharing (key, ts): order by the payload
    # struct itself so the carried "last" is the struct-max — total and
    # run-stable (F.last under equal sort keys is shuffle-dependent).
    def carry(ts_order: F.Column) -> F.Column:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.col(_SIDE), row_struct.asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(row_struct, ignorenulls=True).over(w)

    if direction == "nearest":
        # both candidates over the SAME partitioning — one shuffle
        carried = unioned.select(
            "*",
            carry(F.col("__ts")).alias("__cf_b"),
            carry(F.col("__ts").desc()).alias("__cf_f"),
        )
        l_us = F.unix_micros(F.col(left_ts))
        b_ts = F.col("__cf_b")[f"{right_ts}{suffix}"]
        f_ts = F.col("__cf_f")[f"{right_ts}{suffix}"]
        gap_b = l_us - F.unix_micros(b_ts)
        gap_f = F.unix_micros(f_ts) - l_us
        pick_b = F.col("__cf_f").isNull() | (
            F.col("__cf_b").isNotNull() & (gap_b <= gap_f)
        )
        carried = carried.select(
            "*",
            F.when(pick_b, F.col("__cf_b")).otherwise(F.col("__cf_f")).alias("__cf"),
        )
    else:
        ts_order = (
            F.col("__ts") if direction == "backward" else F.col("__ts").desc()
        )
        carried = unioned.select("*", carry(ts_order).alias("__cf"))
    out = carried.filter(F.col(_SIDE) == 1)

    matched_ts = F.col("__cf")[f"{right_ts}{suffix}"]
    in_tol = None
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col(left_ts)) - F.unix_micros(matched_ts)
        if direction == "forward":
            gap = -gap
        elif direction == "nearest":
            gap = F.abs(gap)
        in_tol = gap <= int(tolerance_seconds * 1_000_000)

    keep: list = [F.col(c) for c in on]
    keep += [F.col(c) for c in left.columns if c not in set(on)]
    for c in payload:
        v = F.col("__cf")[c]
        if in_tol is not None:
            v = F.when(in_tol, v)
        keep.append(v.alias(c))
    return out.select(*keep)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join via per-key applyInPandas + pandas.merge_asof.

    Same semantics as :func:`asof_join`; different cost model. The
    union-window form shuffles (|L|+|R|) rows once and streams; this
    form materializes each key group in a Python worker — the right
    choice when per-key history fits in memory and groups are many
    (Arrow transfer amortizes), or when pandas-side extras
    (nearest-direction, interpolation) are wanted. Offered as the
    SURVEY J6 "small-data alternative"; equivalence is pinned by
    tests/test_operators_ts.py.
    """
    import pandas as _pd

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(left.sparkSession)

    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {right_ts}]

    l_fields = [(c, left.schema[c].dataType.simpleString()) for c in left.columns]
    out_fields = l_fields + [
        (f"{c}{suffix}", right.schema[c].dataType.simpleString()) for c in right_cols
    ] + [(f"{right_ts}{suffix}", right.schema[right_ts].dataType.simpleString())]
    out_schema = ", ".join(f"{n} {t}" for n, t in out_fields)

    r_sel = right.select(
        *on,
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("__side", F.lit(1))
    l_sel = left.withColumn("__side", F.lit(0))
    # align columns for a single grouped frame
    for c in [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]:
        l_sel = l_sel.withColumn(c, F.lit(None).cast(dict(out_fields)[c]))
    for c in [c for c in left.columns if c not in on]:
        r_sel = r_sel.withColumn(c, F.lit(None).cast(dict(l_fields)[c]))
    both = l_sel.unionByName(r_sel)

    lcols = [c for c in left.columns]
    rts = f"{right_ts}{suffix}"
    rpay = [f"{c}{suffix}" for c in right_cols]

    def merge(pdf: _pd.DataFrame) -> _pd.DataFrame:
        lpdf = pdf[pdf["__side"] == 0][lcols].sort_values(left_ts)
        rpdf = pdf[pdf["__side"] == 1][[rts, *rpay]].dropna(subset=[rts]).sort_values(rts)
        if len(lpdf) == 0:
            return _pd.DataFrame(columns=[n for n, _ in out_fields])
        merged = _pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=rts, direction=direction
        )
        return merged[[n for n, _ in out_fields]]

    return both.groupBy(*on).applyInPandas(merge, out_schema)

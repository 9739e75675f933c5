"""Bucketed range / interval join (SURVEY.md §2 J5).

OSS Spark has no range-join optimization: a raw
``a.join(b, (b.ts > a.ts - Δ) & (b.ts <= a.ts))`` plans as a
BroadcastNestedLoopJoin / cartesian — O(|A|·|B|) comparisons, fatal at
scale. The standard fix (public pattern, used by e.g. Databricks'
range-join hint internally): quantize both sides to Δ-wide buckets,
equi-join on (key, bucket) where the probe side also matches the
neighbor bucket, then apply the exact range predicate as a residual
filter. Each probe row meets only the ~2 buckets that can contain
matches, so the join is a plain shuffled equi-join with ~2× fan-out,
fully AQE/skew-join eligible.

Supported flavors:
- ``how="inner"``: matching (probe, build) pairs only.
- ``how="left"``: every probe row survives; probe rows with no in-range
  build row appear once with NULL build columns (zero-preserving).
  Implemented as inner + anti-join backfill, so the wide build payload
  never rides through an outer join, and the anti side shuffles only
  ``probe_id``.
- :func:`range_join_count`: LEFT-join count aggregate (the cheapest
  zero-preserving flavor; output is |probe| rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, w_us: int) -> Column:
    """Exact Δ-wide bucket id, floor semantics for all epochs.

    ``floor(unix_micros / w)`` on doubles is provably exact here: for
    integer a with |a| < 2^53 and integer w > 0, the IEEE-correctly-
    rounded double quotient a/w can only cross an integer boundary if
    some d >= 1 satisfies d/w < |a/w| * 2^-53, i.e. |a| > 2^53 — and
    unix_micros stays below 2^53 until year ~2255 (and above -2^53 back
    past year 1685). Plain ``cast(long)`` would truncate toward zero and
    misbucket pre-1970 timestamps; floor is the correct quantizer.
    """
    return F.floor(F.unix_micros(col) / F.lit(w_us)).cast("long")


def range_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    lookback_seconds: int,
    how: str = "inner",
    probe_id: str | None = None,
) -> DataFrame:
    """Join rows of ``build`` with ``build_ts`` in the half-open window
    (probe_ts - lookback, probe_ts] per key. Build-side join-key columns
    are dropped from the output (they always equal the probe's); other
    build columns keep their names, so callers should pre-select/alias
    to avoid collisions with probe columns.

    ``how="left"`` requires ``probe_id`` (a column uniquely identifying
    probe rows) and preserves non-matching probe rows with NULL build
    columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    if how == "left" and probe_id is None:
        raise ValueError("how='left' requires probe_id")
    w_us = int(lookback_seconds) * 1_000_000

    # Probe row at bucket b can only match build rows in bucket b or b-1.
    p = probe.withColumn(
        "__rj_bucket",
        F.explode(F.array(_bucket(F.col(probe_ts), w_us), _bucket(F.col(probe_ts), w_us) - 1)),
    )
    b = build.withColumn("__rj_bucket", _bucket(F.col(build_ts), w_us))

    cond = [p["__rj_bucket"] == b["__rj_bucket"]] + [p[k] == b[k] for k in on]
    # A (probe, build) pair matches exactly one exploded copy (the build
    # row's single bucket), so the inner result has no bucket-duplicates.
    joined = p.join(b, cond, "inner")
    in_range = (F.unix_micros(b[build_ts]) > F.unix_micros(p[probe_ts]) - w_us) & (
        F.unix_micros(b[build_ts]) <= F.unix_micros(p[probe_ts])
    )
    inner = joined.filter(in_range).drop("__rj_bucket")
    for k in on:
        inner = inner.drop(b[k])
    if how == "inner":
        return inner

    # Zero-preservation: anti-join back the probe rows with no match.
    # The anti side shuffles only the id column, never the payload.
    matched_ids = inner.select(F.col(probe_id).alias("__rj_matched_id"))
    unmatched = probe.join(
        matched_ids, probe[probe_id] == matched_ids["__rj_matched_id"], "left_anti"
    ).select(
        "*",
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in build.schema.fields
            if f.name not in on
        ],
    )
    return inner.unionByName(unmatched)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner interval-overlap join: pairs whose [start, end] spans
    intersect (closed intervals: ls <= re AND rs <= le) per key.

    Bucketed like :func:`range_join`: each interval explodes across the
    Δ-wide buckets it covers and the join is a plain (key, bucket)
    equi-join with the exact overlap predicate as residual filter. A
    pair overlapping across several buckets is emitted ONCE without any
    dropDuplicates: only the canonical bucket — max(bucket(ls),
    bucket(rs)), which both intervals cover whenever they overlap —
    produces it. Cost is O(interval_len/Δ) exploded rows per side, so
    pick ``bucket_seconds`` near the median interval length; at 100 TB
    this stays a shuffled equi-join (AQE/skew eligible), never a
    cartesian.

    Both sides keep their non-key columns (pre-alias to avoid
    collisions); the right side's key columns are dropped.
    """
    w_us = int(bucket_seconds) * 1_000_000

    def span(start: str, end: str) -> F.Column:
        return F.sequence(
            _bucket(F.col(start), w_us), _bucket(F.col(end), w_us)
        )

    l = left.withColumn("__ij_bucket", F.explode(span(left_start, left_end)))
    r = right.withColumn("__ij_bucket", F.explode(span(right_start, right_end)))

    cond = [l["__ij_bucket"] == r["__ij_bucket"]] + [l[k] == r[k] for k in on]
    j = l.join(r, cond, "inner")
    overlap = (F.unix_micros(l[left_start]) <= F.unix_micros(r[right_end])) & (
        F.unix_micros(r[right_start]) <= F.unix_micros(l[left_end])
    )
    canonical = l["__ij_bucket"] == F.greatest(
        _bucket(l[left_start], w_us), _bucket(r[right_start], w_us)
    )
    out = j.filter(overlap & canonical).drop(l["__ij_bucket"]).drop(r["__ij_bucket"])
    for k in on:
        out = out.drop(r[k])
    return out


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    lookback_seconds: int,
    probe_id: str,
    count_alias: str = "n_matches",
) -> DataFrame:
    """LEFT-join flavor: per probe row, COUNT of build rows in window
    (zero-preserving). Aggregates away the fan-out immediately, so the
    shuffle output is |probe| rows regardless of match multiplicity.
    """
    w_us = int(lookback_seconds) * 1_000_000

    p = probe.withColumn(
        "__rj_bucket",
        F.explode(
            F.array(_bucket(F.col(probe_ts), w_us), _bucket(F.col(probe_ts), w_us) - 1)
        ),
    )
    bsel = build.select(
        *[F.col(k).alias(f"__rj_{k}") for k in on],
        F.col(build_ts).alias("__rj_ts"),
    ).withColumn("__rj_bucket", _bucket(F.col("__rj_ts"), w_us))

    cond = [p["__rj_bucket"] == bsel["__rj_bucket"]] + [
        p[k] == bsel[f"__rj_{k}"] for k in on
    ]
    joined = p.join(bsel, cond, "left")
    in_range = (
        F.unix_micros(F.col("__rj_ts")) > F.unix_micros(F.col(probe_ts)) - w_us
    ) & (F.unix_micros(F.col("__rj_ts")) <= F.unix_micros(F.col(probe_ts)))

    return (
        joined.groupBy(probe_id)
        .agg(F.count(F.when(in_range, F.lit(1))).alias(count_alias))
    )

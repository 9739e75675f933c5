"""Largest-Triangle-Three-Buckets downsampling (per-series).

The standard TSDB visualization downsampler (Steinarsson 2013, public
algorithm): keep first and last points, split the middle into n_out-2
buckets, and from each bucket keep the point forming the largest
triangle with the previously KEPT point and the next bucket's average.
The previously-kept-point dependency makes it inherently sequential per
series — exactly the sanctioned Python-boundary case (docs/scale.md):
``applyInPandas`` per key, Arrow-batched, one shuffle on the series
key. Each series must fit a worker's memory (same contract as
``asof_join_pandas``); the cross-series fan-out is what scales.

Determinism and the oracle (r7): the selection compares SPAN-SCALED
triangle areas

    A_j = |(px·span − Σx) · (y_j − py) − (px − x_j) · (Σy − py·span)|

which equals 2·span·area — a positive constant per bucket, so the
argmax is unchanged — but contains no division and no mean. Fed
INTEGER coordinates (epoch-microsecond x, fixed-point ``value_scale``
y, the house round(value·100)-cents rule), every quantity is an exact
integer in both Python (arbitrary precision) and DuckDB (HUGEINT), so
the per-bucket argmax — and therefore the kept-point set — is
bit-identical across engines and the query is fully SQL-oracle-able
(ts_lttb_downsample's recursive CTE). Bucket boundaries use integer
floor division for the same reason. With float inputs the same code
runs IEEE arithmetic in fixed order and stays deterministic — but it
computes the SPAN-SCALED formula (and integer bucket boundaries), so
on near-tie areas or boundary-straddling rationals float-mode output
may differ from the pre-r7 mean-anchored implementation by one
kept point; callers pin against the shared reference, not historical
output. Area ties keep the earliest point in either mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lttb_select_indices(xs: list, ys: list, n_out: int) -> list[int]:
    """Indices kept by LTTB for one series already sorted by x.

    Shared by the Spark operator and the pure-Python test reference so
    equivalence tests pin the *distribution machinery*, not a second
    copy of the algorithm. Exact when xs/ys are ints (see module doc).
    """
    n = len(xs)
    if n_out >= n or n <= 2:
        return list(range(n))
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    kept = [0]
    # middle bucket i covers the half-open index slice
    # [1 + i*(n-2)//m, 1 + (i+1)*(n-2)//m); integer floor division =
    # exact rational boundaries, identical in SQL
    m = n_out - 2
    prev = 0
    for i in range(m):
        lo = 1 + (i * (n - 2)) // m
        hi = min(1 + ((i + 1) * (n - 2)) // m, n - 1)
        nxt_lo, nxt_hi = hi, min(1 + ((i + 2) * (n - 2)) // m, n - 1)
        if nxt_hi <= nxt_lo:  # last middle bucket: anchor on final point
            span, sx, sy = 1, xs[n - 1], ys[n - 1]
        else:
            span = nxt_hi - nxt_lo
            sx = sum(xs[nxt_lo:nxt_hi])
            sy = sum(ys[nxt_lo:nxt_hi])
        px, py = xs[prev], ys[prev]
        best, best_area = lo, -1
        for j in range(lo, hi):
            area = abs(
                (px * span - sx) * (ys[j] - py) - (px - xs[j]) * (sy - py * span)
            )
            if area > best_area:
                best, best_area = j, area
        kept.append(best)
        prev = best
    kept.append(n - 1)
    return kept


def lttb_downsample(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    n_out: int,
    value_scale: int | None = None,
) -> DataFrame:
    """Downsample each key's series to ≤ n_out points with LTTB.

    Output schema: keys + (ts_col, value_col) of the kept points.
    Rows per key: min(n_out, series length). Series with ≤ 2 points
    pass through unchanged.

    ``value_scale``: when set (e.g. 100 for cents-precision data), the
    selection runs on integer coordinates — epoch-microsecond x and
    round(value·scale) y — making the kept-point set exact and
    engine-portable (the SQL-oracle mode; see module doc). When None,
    float coordinates run the same span-scaled selection in IEEE
    arithmetic (deterministic; see the module doc's note on the r7
    formula change).
    """
    import math

    import pandas as pd

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    key_fields = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, {ts_col} {df.schema[ts_col].dataType.simpleString()}, "
        f"{value_col} {df.schema[value_col].dataType.simpleString()}"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        # total order: (ts, value) + stable sort — duplicate-ts rows
        # land identically regardless of upstream shuffle order
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort").reset_index(
            drop=True
        )
        if value_scale is not None:
            xs = [int(t.value) // 1000 for t in pdf[ts_col]]  # epoch micros
            # half-away-from-zero, matching SQL round() — Python's
            # built-in round() is banker's and diverges on exact .5
            # doubles (same class as the ts_pelt_segments fix)
            ys = [
                int(math.copysign(math.floor(abs(float(v) * value_scale) + 0.5), v))
                for v in pdf[value_col]
            ]
        else:
            xs = [t.timestamp() for t in pdf[ts_col]]
            ys = [float(v) for v in pdf[value_col]]
        idx = lttb_select_indices(xs, ys, n_out)
        return pdf.iloc[idx][[*keys, ts_col, value_col]]

    return df.select(*keys, ts_col, value_col).groupBy(*keys).applyInPandas(
        pick, out_schema
    )

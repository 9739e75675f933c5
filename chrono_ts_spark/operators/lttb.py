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

Determinism: pure IEEE double arithmetic evaluated in a fixed
left-to-right order per series; area ties keep the earliest point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lttb_select_indices(xs: list[float], ys: list[float], n_out: int) -> list[int]:
    """Indices kept by LTTB for one series already sorted by x.

    Shared by the Spark operator and the pure-Python test reference so
    equivalence tests pin the *distribution machinery*, not a second
    copy of the algorithm.
    """
    n = len(xs)
    if n_out >= n or n <= 2:
        return list(range(n))
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    kept = [0]
    # bucket i (0-based middle bucket) covers the half-open slice
    # [1 + i*step, 1 + (i+1)*step) of the interior points
    step = (n - 2) / (n_out - 2)
    prev = 0
    for i in range(n_out - 2):
        lo = 1 + int(i * step)
        hi = 1 + int((i + 1) * step)
        hi = min(hi, n - 1)
        nxt_lo, nxt_hi = hi, min(1 + int((i + 2) * step), n - 1)
        if nxt_hi <= nxt_lo:  # last middle bucket: anchor on final point
            ax, ay = xs[n - 1], ys[n - 1]
        else:
            span = nxt_hi - nxt_lo
            ax = sum(xs[nxt_lo:nxt_hi]) / span
            ay = sum(ys[nxt_lo:nxt_hi]) / span
        px, py = xs[prev], ys[prev]
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (px - ax) * (ys[j] - py) - (px - xs[j]) * (ay - py)
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
) -> DataFrame:
    """Downsample each key's series to ≤ n_out points with LTTB.

    Output schema: keys + (ts_col, value_col) of the kept points.
    Rows per key: min(n_out, series length). Series with ≤ 2 points
    pass through unchanged.
    """
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
        xs = [t.timestamp() for t in pdf[ts_col]]
        ys = [float(v) for v in pdf[value_col]]
        idx = lttb_select_indices(xs, ys, n_out)
        return pdf.iloc[idx][[*keys, ts_col, value_col]]

    return df.select(*keys, ts_col, value_col).groupBy(*keys).applyInPandas(
        pick, out_schema
    )

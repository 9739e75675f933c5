"""Dynamic-time-warping distance between keyed series (banded DP).

The classic elastic similarity measure for time series — the distance
behind motif search, series clustering, and query-by-example, tolerant
of local time shifts where Euclidean/Pearson alignment (ts_series_corr)
is not.

Design: the DP recursion is inherently sequential per PAIR, so it runs
inside the sanctioned numpy boundary (applyInPandas per pair — the
CUSUM/EMA contract): cross-pair fan-out is the parallelism. Inputs are
exact integer series (cents), the cost is |a - b| (L1, stays integer),
and every DP cell is an integer exactly represented in float64 — the
result is bit-deterministic regardless of partitioning. A Sakoe-Chiba
band caps each row of the DP at 2r+1 cells: O(n * r) time and O(2r+1)
rolling memory per pair, so a pair of month-long hourly series (720
points) costs ~35k cells — microseconds. At 100 TB the number of
SERIES grows, not their bucketed length (fixed calendar): pair count
is the scale axis, and pairs distribute perfectly.
"""

from __future__ import annotations

import numpy as np


def dtw_banded(a: np.ndarray, b: np.ndarray, band: int) -> int:
    """Banded DTW with L1 cost on integer arrays; returns the exact
    integer distance, or -1 if the band cannot connect the corners
    (band < |len(a) - len(b)|)."""
    n, m = len(a), len(b)
    if abs(n - m) > band:
        return -1
    if n == 0 or m == 0:
        # an empty side within the band guard: zero distance when both
        # are empty; an empty-vs-nonempty pair has no warping path, so
        # it reports unreachable (-1) like a band miss — never the
        # int(inf) OverflowError the bare DP produced (r7 review)
        return 0 if n == m else -1
    inf = float("inf")
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        lo = max(1, i - band)
        hi = min(m, i + band)
        ai = float(a[i - 1])
        for j in range(lo, hi + 1):
            c = abs(ai - float(b[j - 1]))
            best = prev[j - 1]
            if prev[j] < best:
                best = prev[j]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = c + best
        prev = cur
    return int(prev[m])

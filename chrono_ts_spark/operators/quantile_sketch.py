"""KLL-style mergeable quantile sketch (deterministic compactors).

Exact percentiles need a full sort (or Spark's built-in
`percentile`, which collects per-group value multisets); at 100 TB
what you want is a bounded-size MERGEABLE summary, the same reason
operators/heavyhitters.py exists for frequencies. This is the
compactor construction behind the KLL sketch (Karnin/Lang/Liberty,
FOCS 2016) with one deliberate twist: compaction keeps every other
element of the sorted buffer with an offset that ALTERNATES per
(level, compaction-count) instead of a coin flip — fully
deterministic for a given partitioning, at the cost of the adversarial
worst case the random offset protects against (irrelevant for
monitoring workloads, and the empirical rank error is pinned in
tests/test_quantile_sketch.py under several partitionings).

Spark shape: one mapInPandas pass builds a sketch per partition and
emits its (value, weight) items — at most capacity × log2(n/capacity)
rows per partition. The global quantile read-off is a weighted-rank
scan over those few emitted rows (window cumulative sum), so nothing
large is ever sorted, shuffled, or collected.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class _Compactors:
    def __init__(self, capacity: int):
        self.cap = capacity
        self.levels: list[list[float]] = [[]]
        self.parity: list[int] = [0]

    def add_array(self, xs: np.ndarray) -> None:
        self.levels[0].extend(xs.tolist())
        self._compress()

    def _compress(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            if len(self.levels[lvl]) >= self.cap:
                buf = sorted(self.levels[lvl])
                # only an even count may compact (two weight-w items
                # become one weight-2w item) — hold the max back at
                # this level when odd, or total weight isn't conserved
                held = []
                if len(buf) % 2 == 1:
                    held = [buf[-1]]
                    buf = buf[:-1]
                off = self.parity[lvl]
                self.parity[lvl] ^= 1
                promoted = buf[off::2]
                self.levels[lvl] = held
                if lvl + 1 == len(self.levels):
                    self.levels.append([])
                    self.parity.append(0)
                self.levels[lvl + 1].extend(promoted)
            lvl += 1

    def items(self) -> tuple[list[float], list[int]]:
        vals: list[float] = []
        wts: list[int] = []
        for lvl, buf in enumerate(self.levels):
            vals.extend(buf)
            wts.extend([1 << lvl] * len(buf))
        return vals, wts


def sketch_items(df: DataFrame, col: str, capacity: int = 200) -> DataFrame:
    """[value, weight] — per-partition compactor sketches, emitted as
    weighted items (the mergeable summary). Null/NaN values are dropped
    first, so total weight == the NON-NULL row count and quantiles are
    quantiles of the non-null subset (SQL aggregate convention)."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    def partial(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = _Compactors(capacity)
        for pdf in pdfs:
            xs = pdf["value"].to_numpy(dtype="float64")
            sk.add_array(xs[~np.isnan(xs)])
        vals, wts = sk.items()
        if vals:
            yield pd.DataFrame({"value": vals, "weight": wts})

    return df.select(F.col(col).cast("double").alias("value")).mapInPandas(
        partial, "value double, weight long"
    )


def kll_quantiles(
    df: DataFrame, col: str, qs: Sequence[float], capacity: int = 200
) -> DataFrame:
    """[q, estimate] — approximate quantiles from the merged sketch.

    estimate(q) = smallest sketch value whose cumulative weight reaches
    q × total weight (weighted lower rank). The read-off runs over the
    emitted items only (≤ partitions × capacity × log2(n) rows).

    r6: the cumulative weight is a two-level distributed prefix sum —
    per-range cumsum under a PARTITIONED window plus broadcast range
    offsets — instead of one unpartitioned window over all items. The
    range grid is value-uniform (min/max from a 1-row broadcast, the
    z-order bounds pattern) and the offset table is `.limit(_RANGES)`-
    bounded so the plan itself proves the one remaining global window
    tiny (tools/explain_audit.py window rule — no allowlist needed).
    Range id is monotone in value, so (range, value, weight) order ==
    (value, weight) order and cw is bit-identical to the r5 form."""
    # materialize the tiny items table ONCE (<= partitions x capacity
    # x log2(n) rows): bounds / per-range cumsum / range totals /
    # read-off all branch from it, and without truncation each branch
    # re-runs the full-input mapInPandas sketch pass (~5 input scans
    # per call at 100 TB; r7 review — the dd09019 compute-once fix
    # applied here via localCheckpoint, the connected-components
    # pattern)
    items = sketch_items(df, col, capacity).localCheckpoint(eager=True)
    _RANGES = 1024
    bounds = items.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    it = items.crossJoin(F.broadcast(bounds)).withColumn(
        "rng",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(_RANGES - 1),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / F.lit(float(_RANGES)))
                ).cast("int"),
            )
        ),
    )
    w_in = Window.partitionBy("rng").orderBy("value", "weight").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_in = it.withColumn("cw_in", F.sum("weight").over(w_in))
    rng_tot = (
        it.groupBy("rng").agg(F.sum("weight").alias("wt"))
        .orderBy("rng")
        .limit(_RANGES)
    )
    w_rng = Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)
    offsets = rng_tot.withColumn(
        "off", F.coalesce(F.sum("wt").over(w_rng), F.lit(0))
    )
    cum = cum_in.join(F.broadcast(offsets.select("rng", "off")), "rng").withColumn(
        "cw", F.col("cw_in") + F.col("off")
    )
    total = cum.agg(F.max("cw").alias("n"))
    c = cum.crossJoin(F.broadcast(total))
    # single aggregate reads off every q at once (one filter+agg branch
    # per q would re-evaluate the sketch subplan unless ReuseExchange
    # happens to fire), then pivot the one wide row to (q, estimate)
    wide = c.agg(
        *[
            F.min(
                F.when(F.col("cw") >= F.lit(float(q)) * F.col("n"), F.col("value"))
            ).alias(f"q{i}")
            for i, q in enumerate(qs)
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(float(q)).alias("q"), F.col(f"q{i}").alias("estimate"))
            for i, q in enumerate(qs)
        ]
    )
    return wide.select(F.explode(pairs).alias("e")).select("e.q", "e.estimate")

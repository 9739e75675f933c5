"""Fixed-iteration PageRank with deterministic arithmetic.

Iterative algorithms are the class the driver's correctness harness
normally can't oracle (state evolves across jobs). Pinning the
iteration count and making every per-node contribution sum
order-independent (decimal-exact, like ivf_fit_centroids and the CUSUM
stats) makes each iteration a pure function of the last — so a SQL
engine can replay the exact same fixed number of update steps as
chained CTEs and the ranks match bit-for-bit.

Update rule (standard damped PageRank over an undirected co-occurrence
graph, so every connected node has out-degree >= 1 and there are no
dangling-mass corrections):

    r'(v) = (1-d)/N + d * sum_{u -> v} r(u) / deg(u)

Scale shape per iteration: one join of the edge list against the
O(nodes) rank table (ranks broadcast when small, else a co-partitioned
shuffle on src) and one aggregation by dst — the classic Pregel-style
round expressed relationally; lineage stays shallow because the rank
table is tiny relative to edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = DAMPING,
) -> DataFrame:
    """[node, rank] after `iters` synchronous updates.

    nodes: [node] (one row per vertex, including isolated ones).
    edges: [src, dst] DIRECTED rows (pass both directions for an
    undirected graph). Contributions are summed in SCALED-INTEGER fixed
    point — floor((r/deg) * 1e18) as long — so the sum is shuffle-order
    independent AND engine-portable: double→decimal casts of arbitrary
    quotients round DIFFERENTLY in Spark vs DuckDB once the double's
    binary expansion extends past the decimal scale (measured:
    0.0003846153846153846 → …8460 vs …8464 at scale 20), while double
    multiply + floor are plain IEEE ops every engine agrees on
    (docs/determinism.md). The long sum bounds the graph at ~9e18 total
    scaled mass (ranks sum to ≤ 1, so this never binds).
    """
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    base = F.lit(1.0 - damping) / F.col("n")
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(
                (
                    F.sum(F.floor(F.col("c") * F.lit(1e18)).cast("long")).cast("double")
                    / F.lit(1e18)
                ).alias("s")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    base + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks

"""Vector / embedding queries (SURVEY.md §2.10 X7 + ANN extension).

Oracle mirrors compute dot products with an explicit generate_series
index walk so both engines accumulate left-to-right in double — the
DuckDB list_dot_product built-in is avoided because its accumulation
order is unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import davg, vec_double, vec_norm_sq
from ..operators.similarity import brute_force_topk, lsh_bucket_topk
from . import query

_DIMS = 64

_SQL_DOT = (
    "list_sum(list_transform(generate_series(1, {n}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _sql_dot(a: str, b: str, n: int = _DIMS) -> str:
    return _SQL_DOT.format(a=a, b=b, n=n)


# ---------------------------------------------------------------------------
# Norms / basic vector math
# ---------------------------------------------------------------------------


@query(
    "emb_norms",
    oracle=f"""
SELECT vec_id, label,
       CAST(len(embedding) AS INTEGER) AS dim,
       SQRT({_sql_dot('embedding', 'embedding')}) AS l2_norm,
       list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
FROM embeddings
""",
    tags=("vectors", "X7"),
)
def emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm and max-abs per embedding (built-in HOFs, no UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = vec_double(F.col("embedding"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.sqrt(vec_norm_sq(v)).alias("l2_norm"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("max_abs"),
    )


# ---------------------------------------------------------------------------
# X7: brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------


@query(
    "emb_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id,
           {_sql_dot('qv', 'cv')} /
           SQRT({_sql_dot('qv', 'qv')} * {_sql_dot('cv', 'cv')}) AS cosine
    FROM q CROSS JOIN c
    WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rnk
    FROM scored
)
WHERE rnk <= 5
""",
    tags=("vectors", "X7", "bench"),
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for probe vectors vec_id < 10.

    Probe set is broadcast; the corpus is scanned map-side only —
    the scale-correct shape for few-probe exact search.
    """
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return brute_force_topk(e, probes, k=5)


# ---------------------------------------------------------------------------
# ANN: sign-LSH bucketed approximate top-k (rows-only; recall vs the
# exact baseline is asserted in pytest)
# ---------------------------------------------------------------------------


@query("emb_ann_lsh", oracle=None, tags=("vectors", "ANN", "no-oracle", "bench"))
def emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-table sign-LSH (8 tables × 6 bits)."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return lsh_bucket_topk(e, probes, dims=_DIMS, k=5, n_planes=6, n_tables=8)


# ---------------------------------------------------------------------------
# Per-label centroids in long form (label, pos, avg) — avoids array
# reassembly while still exercising grouped vector math
# ---------------------------------------------------------------------------


@query(
    "emb_label_centroids",
    oracle="""
SELECT label, CAST(pos AS INTEGER) AS pos,
       round(CAST(SUM(CAST(CAST(embedding[pos] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_val,
       COUNT(*) AS n
FROM embeddings
CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos)
GROUP BY label, pos
""",
    tags=("vectors", "centroid"),
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, long form (pos is 1-based dimension index)."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(vec_double(F.col("embedding"))).alias("pos0", "val")
    ).select("label", (F.col("pos0") + 1).alias("pos"), "val")
    # Final round(…, 6): continuous (float-origin) values can land on a
    # 9-decimal half-way point where the engines' double→decimal
    # rounding disagrees by one decimal ulp (seen at sf0.1); rounding
    # the quotient absorbs that.
    return exploded.groupBy("label", "pos").agg(
        F.round(davg("val", 18, 9), 6).alias("avg_val"),
        F.count(F.lit(1)).alias("n"),
    )


@query("emb_ann_ivf", oracle=None, tags=("vectors", "ANN", "no-oracle"))
def emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (16-cell k-means quantizer, 2 probes)."""
    from ..operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return ivf_topk(e, probes, dims=_DIMS, k=5, n_centroids=16, n_probe=2)

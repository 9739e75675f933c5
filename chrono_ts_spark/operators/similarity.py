"""Vector similarity search over array<float> embedding columns.

Two tiers:

- brute_force_topk: exact cosine top-k. The (small) query set is
  broadcast against the corpus — a map-side nested loop with no
  shuffle of the corpus, then one shuffle of |Q|·k candidate rows for
  the final per-query rank. Right shape for "a handful of probes
  against 100 TB of vectors".
- lsh_bucket_topk: sign-LSH (random hyperplanes) approximate top-k.
  Every vector gets an n_planes-bit bucket id; probes only score
  vectors in the same bucket (optionally hamming<=1 neighbors), an
  equi-join on bucket id. Recall/cost is tunable via n_planes; the
  join is shuffle-partitioned by bucket, so it scales horizontally
  and AQE's skew handling covers hot buckets.

Hyperplanes are deterministic (seeded numpy), embedded as literal
arrays — dims × n_planes doubles, negligible plan size. All math is
built-in higher-order functions in double precision (no UDFs).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vec_cosine, vec_double
from .topk import top_k_per_group


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_alias: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of corpus vectors for each query vector."""
    q = queries.select(
        F.col(id_col).alias(query_id_alias),
        vec_double(F.col(vec_col)).alias("__qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), vec_double(F.col(vec_col)).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_alias))
        .select(
            query_id_alias,
            "neighbor_id",
            vec_cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored,
        group=[query_id_alias],
        order=[F.col("cosine").desc(), F.col("neighbor_id")],
        k=k,
    )


def _hyperplanes(dims: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dims))


def sign_lsh_bucket(
    vec: Column, dims: int, n_planes: int = 12, seed: int = 7
) -> Column:
    """n_planes-bit sign-LSH bucket id (int) for a vector column."""
    planes = _hyperplanes(dims, n_planes, seed)
    bucket = F.lit(0)
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _table_buckets(
    vec: Column, dims: int, n_planes: int, n_tables: int, seed: int
) -> Column:
    """array<struct<table_id,bucket>> — one sign-LSH bucket per table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                sign_lsh_bucket(vec, dims, n_planes, seed + 1000 * t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH.

    Standard LSH design: n_tables independent hash tables of n_planes
    bits each; a candidate is any corpus vector sharing a bucket with
    the query in ANY table. Collision prob for angle θ is
    1-(1-(1-θ/π)^n_planes)^n_tables — recall/cost is tuned by the two
    knobs. The join is an equi-join on (table_id, bucket): the corpus
    side is replicated n_tables× into the shuffle, the scored set is
    only the colliding pairs (deduped across tables before scoring).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        vec_double(F.col(vec_col)).alias("__cv"),
    )
    c = c.select(
        "neighbor_id",
        "__cv",
        F.explode(
            _table_buckets(F.col("__cv"), dims, n_planes, n_tables, seed)
        ).alias("__tb"),
    ).select("neighbor_id", "__cv", "__tb.table_id", "__tb.bucket")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec_double(F.col(vec_col)).alias("__qv"),
    )
    q = q.select(
        "query_id",
        "__qv",
        F.explode(
            _table_buckets(F.col("__qv"), dims, n_planes, n_tables, seed)
        ).alias("__tb"),
    ).select("query_id", "__qv", "__tb.table_id", "__tb.bucket")

    cands = (
        c.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        vec_cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    return top_k_per_group(
        scored,
        group=["query_id"],
        order=[F.col("cosine").desc(), F.col("neighbor_id")],
        k=k,
    )

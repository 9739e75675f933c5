"""Distributed Euclidean k-means (Lloyd's) over an embedding column.

The clustering primitive of the LLM-data-pipeline surface (SemDeDup-
style semantic dedup, corpus stratification, IVF coarse quantizers all
sit on it). Same determinism discipline as ivf_fit_centroids /
pq_fit (operators/similarity.py:179, operators/pq.py:56):

- init = the first k vectors by id (deterministic, layout-independent;
  a seeded k-means++ is the documented quality upgrade — determinism
  would survive it because the seed fixes the probe sequence);
- assignment = Arrow pandas_udf, argmin squared L2 with ties broken to
  the lowest centroid id (BLAS matmul per batch, vectors never leave
  executors);
- update = posexplode to (cluster, dim) and DECIMAL-exact per-dim sums
  so centroids are shuffle-order-immune; only the k x dims sum matrix
  ever reaches the driver (the sanctioned bounded collect);
- empty clusters keep their previous centroid (no resample — RNG-free).

Scale: each Lloyd round is one shuffle of (cluster, dim, val) triples
— dims x row amplification, the pq_fit precedent; the mapInPandas
partial-sum variant (one (k x dims) matrix per partition, then a tiny
final agg) is the documented swap-in when dims x rows dominates the
shuffle at full corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _assign_euclid_udf(centroids: np.ndarray):
    """embedding -> nearest centroid id by squared L2 (ties: lowest id)."""
    c = centroids.astype(np.float64)
    c_sq = (c**2).sum(axis=1)

    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.map(lambda v: np.asarray(v, dtype=np.float64)))
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin drops ||x||^2.
        d = -2.0 * (mat @ c.T) + c_sq
        # np.argmin returns the FIRST minimum -> lowest centroid id.
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def _sqdist_udf(centroids: np.ndarray):
    """(embedding, cluster) -> exact squared L2 to the assigned centroid."""
    c = centroids.astype(np.float64)

    @pandas_udf("double")
    def sqdist(emb: pd.Series, cluster: pd.Series) -> pd.Series:
        mat = np.vstack(emb.map(lambda v: np.asarray(v, dtype=np.float64)))
        diff = mat - c[cluster.to_numpy()]
        return pd.Series((diff**2).sum(axis=1))

    return sqdist


def kmeans_fit(
    df: DataFrame,
    dims: int,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd's iterations; returns the (k, dims) centroid
    matrix. See module docstring for the determinism contract."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")
    centroids = np.array([list(r[0]) for r in init_rows], dtype=np.float64)

    for _ in range(iters):
        assign = _assign_euclid_udf(centroids)
        assigned = df.select(
            assign(F.col(vec_col)).alias("cluster"),
            F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias(
                "pos", "val"
            ),
        )
        sums = (
            assigned.groupBy("cluster", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double").alias("s"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        )
        new = centroids.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cluster, np.zeros(dims))[r.pos] = r.s
            cnt[r.cluster] = r.cnt
        for cid, vec in acc.items():
            new[cid] = vec / cnt[cid]
        centroids = new
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final assignment pass: (id cols..., cluster, sqdist)."""
    assign = _assign_euclid_udf(centroids)
    sqd = _sqdist_udf(centroids)
    out = df.withColumn("cluster", assign(F.col(vec_col)))
    return out.withColumn("sqdist", sqd(F.col(vec_col), F.col("cluster")))

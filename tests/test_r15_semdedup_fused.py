"""r15: emb_semdedup's fused refine+prune must reproduce the two-stage
pipeline (hierarchical_kmeans_assign -> groupBy(cluster) prune)
bit-for-bit — same survivors, same cluster ids — on the fixture corpus
and on a synthetic multi-cell corpus with planted near-duplicates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign
from chrono_ts_spark.queries import load_all

from conftest import SF_SMOKE

DIMS = 64


def two_stage(spark, emb, k):
    """The pre-r15 emb_semdedup pipeline, reconstructed verbatim."""
    assigned = hierarchical_kmeans_assign(
        emb, dims=DIMS, k=k, levels=3
    ).select("vec_id", "label", "cluster", "embedding")

    def prune(pdf):
        pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )
        norms = np.sqrt((mat**2).sum(axis=1))
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        c = len(pdf)
        iu = np.triu_indices(c, k=1)
        drop = np.zeros(c, dtype=bool)
        hits = sims[iu] >= 0.95
        np.logical_or.at(drop, iu[1][hits], True)
        return pdf.loc[~drop, ["vec_id", "label", "cluster"]]

    return assigned.groupBy("cluster").applyInPandas(
        prune, schema="vec_id long, label int, cluster int"
    )


def rows_of(df):
    return sorted((r.vec_id, r.label, r.cluster) for r in df.collect())


def test_fused_matches_two_stage_fixture(spark):
    reg = load_all()
    fused = rows_of(reg["emb_semdedup"].fn(spark, SF_SMOKE))
    from chrono_ts_spark.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    k = max(2, emb.count() // 512)
    legacy = rows_of(two_stage(spark, emb, k))
    assert fused == legacy and len(fused) > 0


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(40, DIMS)) * 4
    rows = []
    vid = 0
    for i in range(4000):
        base = centers[i % 40] + rng.normal(size=DIMS) * 0.5
        rows.append((vid, i % 5, base.astype("float32").tolist()))
        vid += 1
        if i % 11 == 0:  # planted near-duplicate of the row above
            dup = base + rng.normal(size=DIMS) * 1e-3
            rows.append((vid, i % 5, dup.astype("float32").tolist()))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_fused_matches_two_stage_synth(spark, synth, tmp_path, monkeypatch):
    # route the registry query at the synthetic corpus via a parquet dir
    path = str(tmp_path / "synthsd")
    synth.write.parquet(f"{path}/embeddings.parquet")
    reg = load_all()
    fused = rows_of(reg["emb_semdedup"].fn(spark, path))
    k = max(2, synth.count() // 512)
    legacy = rows_of(two_stage(spark, synth, k))
    assert fused == legacy
    # sanity: the planted dups actually exercised the drop rule
    assert len(fused) < synth.count()

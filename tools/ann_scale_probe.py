#!/usr/bin/env python
"""ANN/SemDeDup scale A/B probe (r13 backfill of the two r12 8M-vector
probes, VERDICT r12 item 2; extended to 16M per item 4).

The two r12 findings this script reproduces, each a one-variant-per-
invocation solo fresh-JVM run over the shared corpora at
/tmp/chrono_scale_v2_emb_<vecs>:

1. ``lsh``  — lsh_bucket_topk plan generations:
   ``narrow`` is the SHIPPED plan (r13: fused Arrow bucket+cosine —
   each corpus vector scored once against the probe matrix, candidate
   join element_at-indexes the precomputed array).
   ``hof_narrow`` is the r12 plan reconstructed inline (score per
   candidate pair with HOF vec_cosine map-side, then narrow dedup) —
   its per-pair interpreted cosine was the r13 16M cliff: 117 s of
   160 s total.
   ``wide`` is the pre-r12 plan reconstructed inline (dedup BEFORE
   scoring: the exchange carries both 64-dim double vectors,
   ~1 KB/row).
   Readings, same corpora, solo fresh-JVM:
   wide       66.8 s @ 4M → 197.6 s @ 8M (r12; 2.96×/doubling, spill)
   hof_narrow 53.4 s @ 4M →  82.6 s @ 8M → 160.4-177.4 s @ 16M
   fused      17.8 s @ 4M →  25.1 s @ 8M →   47.6-48.5 s @ 16M
   Output membership/ranking identical across all three (cosine moves
   final ulps between HOF fold and numpy pairwise summation — inside
   the rows-only/recall-pinned contract; emb_recall_eval output is
   bit-identical at sf0.001/0.01/0.1).

2. ``semdedup`` — emb_semdedup k-cap A/B (commit 65297f0,
   vectors.py:1038). ``uncapped`` is the shipped pipeline via the
   registry (k = max(2, n // 512), clusters stay ~512 so the
   per-cluster pairwise term is constant). ``capped`` is the pre-r12
   k = max(2, min(4096, n // 512)) reconstructed inline — beyond 2M
   vectors the frozen k makes the pairwise work n²/k. r12 readings:
   capped 43.0 s @ 4M → 84.6 s @ 8M (n²/k regime); uncapped 35.4 s @
   4M → 63.7 s @ 8M (1.8×/doubling). Fixture scales (n < 2M) are
   unaffected (k = n // 512 < 4096 either way).

Usage (one variant per invocation — fresh-JVM probe discipline;
CHRONO_DRIVER_MEM=16g for the 16M runs):

    python tools/ann_scale_probe.py lsh <vecs> narrow|hof_narrow|wide
    python tools/ann_scale_probe.py semdedup <vecs> uncapped|capped
    # r16 (VERDICT r15 item 5): 'two_stage' = r14 reconstruction;
    # 'coarse' = PROBE-ONLY FAISS-style nlist≈sqrt(n) granularity
    # (output-changing — never the registry query), also reports peak
    # per-cell group size; 'cellstats' = assignment-only pass printing
    # the SHIPPED pipeline's per-cell size distribution (the §5 spill
    # unit the r15 fusion widened to one level-1 cell).
    python tools/ann_scale_probe.py ivf <vecs> fused|hof
    python tools/ann_scale_probe.py fit <vecs> partial|explode
    python tools/ann_scale_probe.py pqfit <vecs> partial|explode
    python tools/ann_scale_probe.py pq <vecs> rerank|adc
    # pq (r14): end-to-end fit+encode+ADC (rerank = +exact top-50
    # rerank, the registry emb_pq_topk shape).
    # fit/pqfit (r14): trainer-stage-only A/B — partial = shipped
    # mapInPandas partial-sum Lloyd update (IVF / PQ codebook);
    # explode = pre-r14 posexplode + decimal(18,9) reconstruction.
    # Emits an md5 of the centroid matrix / codebook so cross-variant
    # bit-identity is part of the record.
    # ivf (late r13): fused = shipped (scoring in the cell-assignment
    # Arrow pass, narrow dedup); hof = pre-r13 reconstruction
    # (wide dedup BEFORE per-pair HOF cosine — both cliffs at once).

Prints one JSON line {mode, variant, vecs, out_rows, sec}. Internal
evidence only — correctness always runs on driver fixtures.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

DIMS = 64


def _preflight(vecs: int) -> None:
    """Probe-disk hygiene (r15, VERDICT r14 item 4: the SemDeDup 64M
    frontier died twice on shared-volume spill). Before building a
    corpus, require free space for corpus + spill (~3× the ~300 B/vec
    parquet footprint) and name the rebuildable /tmp/chrono_* corpora
    to delete — they are all regenerated on demand by _corpus."""
    import shutil

    need = vecs * 300 * 3
    free = shutil.disk_usage("/tmp").free
    if free < need:
        rebuildable = sorted(
            str(p) for p in Path("/tmp").glob("chrono_scale_*")
        )
        raise SystemExit(
            f"preflight: {free / 1e9:.1f} GB free on /tmp but ~"
            f"{need / 1e9:.1f} GB needed for a {vecs}-vector probe "
            f"(corpus + spill). Rebuildable corpora to delete: "
            f"{rebuildable or 'none'}"
        )


def _corpus(spark, vecs: int):
    from tools.scale_probe import build_embeddings

    path = f"/tmp/chrono_scale_v2_emb_{vecs}"
    if not Path(f"{path}/embeddings.parquet").exists():
        _preflight(vecs)
        t0 = time.time()
        build_embeddings(spark, path, vecs, DIMS)
        print(f"  built {path} in {time.time() - t0:.1f}s", file=sys.stderr)
    return path


def lsh_wide_legacy(corpus, queries, dims, k, n_planes, n_tables):
    """The pre-r12 lsh_bucket_topk plan (reconstructed from the
    2014ee3 diff): dedup the candidate pairs BEFORE scoring, so the
    cross-table dropDuplicates exchange carries both dims-wide double
    vectors per row. Kept ONLY as the probe's A-side; the shipped
    operator is the narrow variant in operators/similarity.py."""
    from chrono_ts_spark.functions import vec_cosine, vec_double
    from chrono_ts_spark.operators.similarity import _bucket_udf
    from chrono_ts_spark.operators.topk import top_k_per_group
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(corpus.sparkSession)
    bucket_fn = _bucket_udf(dims, n_planes, n_tables, seed=7)
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        vec_double(F.col("embedding")).alias("__cv"),
        F.posexplode(bucket_fn(F.col("embedding"))).alias("table_id", "bucket"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        vec_double(F.col("embedding")).alias("__qv"),
        F.posexplode(bucket_fn(F.col("embedding"))).alias("table_id", "bucket"),
    )
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
        scored, group=["query_id"], order=[F.col("cosine").desc(), "neighbor_id"], k=k
    )


def lsh_hof_narrow_legacy(corpus, queries, dims, k, n_planes, n_tables):
    """The r12 lsh_bucket_topk plan (replaced r13 by the fused Arrow
    scoring pass): per-candidate-pair HOF vec_cosine map-side, then
    the narrow cross-table dedup. Kept as the probe's B-side — its
    interpreted per-pair cosine is the measured 16M cliff."""
    from chrono_ts_spark.functions import vec_cosine, vec_double
    from chrono_ts_spark.operators.similarity import _bucket_udf
    from chrono_ts_spark.operators.topk import top_k_per_group
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(corpus.sparkSession)
    bucket_fn = _bucket_udf(dims, n_planes, n_tables, seed=7)
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        vec_double(F.col("embedding")).alias("__cv"),
        F.posexplode(bucket_fn(F.col("embedding"))).alias("table_id", "bucket"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        vec_double(F.col("embedding")).alias("__qv"),
        F.posexplode(bucket_fn(F.col("embedding"))).alias("table_id", "bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            vec_cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return top_k_per_group(
        scored, group=["query_id"], order=[F.col("cosine").desc(), "neighbor_id"], k=k
    )


def ivf_hof_legacy(corpus, queries, dims, k, n_centroids, n_probe):
    """The pre-r13 ivf_topk plan (replaced by the fused cell+cosine
    Arrow pass): dedup BEFORE scoring (the exchange carries both
    dims-wide double vectors) and per-pair HOF vec_cosine after."""
    from pyspark.sql import functions as F

    from chrono_ts_spark.functions import vec_cosine, vec_double
    from chrono_ts_spark.operators.similarity import (
        _assign_udf,
        ivf_fit_centroids,
    )
    from chrono_ts_spark.operators.topk import top_k_per_group

    centroids = ivf_fit_centroids(corpus, dims, n_centroids, 2, "vec_id", "embedding")
    c_assign = _assign_udf(centroids, 1)
    q_assign = _assign_udf(centroids, n_probe)
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        vec_double(F.col("embedding")).alias("__cv"),
        F.element_at(c_assign(F.col("embedding")), 1).alias("cluster"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        vec_double(F.col("embedding")).alias("__qv"),
        F.explode(q_assign(F.col("embedding"))).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            vec_cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored, group=["query_id"], order=[F.col("cosine").desc(), "neighbor_id"], k=k
    )


def ivf_fit_explode_legacy(corpus, dims, n_centroids, iters):
    """The pre-r14 ivf_fit_centroids Lloyd update (reconstructed from
    the r14 diff): per round, posexplode every assigned vector into
    (cluster, pos, val) triples — O(n×dims) shuffle rows/iteration
    (~1B at 8M×64×2) — and sum cast decimal(18,9). Replaced by the
    mapInPandas partial-sum update (VERDICT r13 item 1)."""
    import numpy as np

    from chrono_ts_spark.functions import vec_double
    from chrono_ts_spark.operators.similarity import _assign_udf
    from chrono_ts_spark.session import ensure_package_on_workers

    n = corpus.count()
    stride = max(1, n // n_centroids)
    init_rows = (
        corpus.filter((F.col("vec_id") % stride == 0))
        .orderBy("vec_id")
        .limit(n_centroids)
        .select("embedding")
        .collect()
    )
    centroids = np.array([list(r[0]) for r in init_rows], dtype=np.float64)
    ensure_package_on_workers(corpus.sparkSession)
    for _ in range(iters):
        assign = _assign_udf(centroids, 1)
        assigned = corpus.select(
            F.element_at(assign(F.col("embedding")), 1).alias("cluster"),
            vec_double(F.col("embedding")).alias("v"),
        )
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double").alias("s"),
                F.count(F.lit(1)).alias("m"),
            )
            .collect()
        )
        new = centroids.copy()
        acc: dict[int, object] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cluster, np.zeros(dims))[r.pos] = r.s
            cnt[r.cluster] = r.m
        for cid, vec in acc.items():
            new[cid] = vec / max(cnt[cid], 1)
        centroids = new
    return centroids


def pq_fit_explode_legacy(corpus, dims, m_sub, k, iters):
    """The pre-r14 pq_fit Lloyd update (reconstructed from the r14
    diff): per round, posexplode every vector's dims into
    (m, c, pos, val) rows — O(n×dims) shuffle rows/iteration — and
    sum cast decimal(18,9)."""
    import numpy as np

    from chrono_ts_spark.operators.pq import _check_geometry, pq_encode_udf
    from chrono_ts_spark.session import ensure_package_on_workers

    sub = _check_geometry(dims, m_sub)
    n = corpus.count()
    stride = max(1, n // k)
    init_rows = (
        corpus.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(k)
        .select("embedding")
        .collect()
    )
    codebook = np.array(
        [[list(r[0])[m * sub : (m + 1) * sub] for r in init_rows] for m in range(m_sub)],
        dtype=np.float64,
    )
    ensure_package_on_workers(corpus.sparkSession)
    for _ in range(iters):
        enc = pq_encode_udf(codebook)
        assigned = corpus.select(
            enc(F.col("embedding")).alias("codes"),
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("pos", "val"),
        ).select(
            (F.col("pos") / sub).cast("int").alias("m"),
            F.element_at("codes", (F.col("pos") / sub).cast("int") + 1).alias("c"),
            "pos",
            "val",
        )
        sums = (
            assigned.groupBy("m", "c", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double").alias("s"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        )
        new = codebook.copy()
        for m in range(m_sub):
            rows = [r for r in sums if r.m == m]
            by_c: dict[int, object] = {}
            n_c: dict[int, int] = {}
            for r in rows:
                by_c.setdefault(r.c, np.zeros(sub))[r.pos - m * sub] = r.s
                n_c[r.c] = r.cnt
            for cid, vec in by_c.items():
                new[m, cid] = vec / max(n_c[cid], 1)
        codebook = new
    return codebook


def run_pqfit(spark, path: str, variant: str):
    """PQ codebook-trainer A/B (r14): (sec, md5-of-codebook)."""
    import hashlib

    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.pq import pq_fit
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    e = load_table(spark, path, "embeddings")
    t0 = time.time()
    if variant == "partial":
        cb = pq_fit(e, DIMS, m_sub=8, k=16, iters=2)
    else:
        cb = pq_fit_explode_legacy(e, DIMS, 8, 16, 2)
    sec = round(time.time() - t0, 1)
    digest = hashlib.md5(cb.tobytes()).hexdigest()[:16]
    return sec, digest


def run_fit(spark, path: str, variant: str):
    """Fit-stage-only A/B (r14): returns (sec, md5-of-centroids) so
    cross-variant bit-identity is part of the probe record."""
    import hashlib

    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.similarity import ivf_fit_centroids
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    e = load_table(spark, path, "embeddings")
    t0 = time.time()
    if variant == "partial":
        cents = ivf_fit_centroids(e, DIMS, 16, 2)
    else:
        cents = ivf_fit_explode_legacy(e, DIMS, 16, 2)
    sec = round(time.time() - t0, 1)
    digest = hashlib.md5(cents.tobytes()).hexdigest()[:16]
    return sec, digest


def run_ivf(spark, path: str, variant: str):
    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.similarity import ivf_topk
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    e = load_table(spark, path, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    if variant == "fused":
        return ivf_topk(e, probes, dims=DIMS, k=5, n_centroids=16, n_probe=2)
    return ivf_hof_legacy(e, probes, dims=DIMS, k=5, n_centroids=16, n_probe=2)


def pq_adc_uncapped_legacy(corpus, queries, codebook, k, rerank):
    """The pre-r15 pq_adc_topk ADC scan (reconstructed): one
    corpus-length scored frame per probe per batch — O(corpus × P)
    rows into the top-k shuffle. Kept ONLY as the probe's A-side; the
    shipped operator caps each batch's output at P·max(k, rerank)
    rows under the same (adc_dist, neighbor_id) total order."""
    import numpy as np
    import pandas as pd

    from chrono_ts_spark.operators.pq import pq_encode
    from chrono_ts_spark.operators.topk import top_k_per_group
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(corpus.sparkSession)
    m_sub = codebook.shape[0]
    q_rows = queries.select("vec_id", "embedding").collect()
    tables = {}
    for r in q_rows:
        qv = np.array(list(r[1]), dtype=np.float64)
        sub = codebook.shape[2]
        tab = np.empty((m_sub, codebook.shape[1]))
        for m in range(m_sub):
            seg = qv[m * sub : (m + 1) * sub]
            tab[m] = ((codebook[m] - seg) ** 2).sum(axis=1)
        tables[r[0]] = tab
    codes_df = pq_encode(corpus, codebook)
    arange = np.arange(m_sub)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            for qid, tab in tables.items():
                d = tab[arange[None, :], codes].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(pdf), qid, dtype=np.int64),
                        "neighbor_id": pdf["vec_id"].to_numpy(),
                        "adc_dist": d,
                    }
                )

    scored = codes_df.mapInPandas(
        score, "query_id long, neighbor_id long, adc_dist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return top_k_per_group(
        scored,
        group=["query_id"],
        order=[F.col("adc_dist").asc(), F.col("neighbor_id")],
        k=(rerank or k),
    )


def run_pq(spark, path: str, variant: str):
    """PQ end-to-end (r14): fit + encode + ADC scan (+ exact rerank
    for the 'rerank' variant) — the compressed-domain ANN pipeline at
    probe scale. Matches the registry emb_pq_topk geometry.
    'adc_uncapped' (r15) reconstructs the pre-r15 uncapped ADC output
    as the batch-cap A/B's A-side (top-R stage only, no rerank join)."""
    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.pq import pq_adc_topk, pq_fit
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    e = load_table(spark, path, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    codebook = pq_fit(e, DIMS, m_sub=8, k=16, iters=2)
    if variant == "adc_uncapped":
        return pq_adc_uncapped_legacy(e, probes, codebook, k=5, rerank=50)
    if variant == "adc_capped":
        # the shipped capped scorer, truncated at the same top-R stage
        # as adc_uncapped so the A/B isolates the scan+top-k leg
        from chrono_ts_spark.operators.pq import pq_adc_topk as _adc

        return _adc(e, probes, codebook, k=50, rerank=0)
    rerank = 50 if variant == "rerank" else 0
    return pq_adc_topk(e, probes, codebook, k=5, rerank=rerank)


def run_lsh(spark, path: str, variant: str):
    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.similarity import lsh_bucket_topk

    e = load_table(spark, path, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    if variant == "narrow":
        return lsh_bucket_topk(e, probes, dims=DIMS, k=5, n_planes=6, n_tables=8)
    if variant == "hof_narrow":
        return lsh_hof_narrow_legacy(e, probes, dims=DIMS, k=5, n_planes=6, n_tables=8)
    return lsh_wide_legacy(e, probes, dims=DIMS, k=5, n_planes=6, n_tables=8)


def semdedup_two_stage_r14(spark, path: str):
    """The r14 emb_semdedup pipeline (uncapped k, levels=3, refine and
    prune as SEPARATE grouped shuffles) — the A-side of the r15 fusion
    A/B. The shipped query now prunes inside the refine cell pass; see
    queries/vectors.py emb_semdedup."""
    import numpy as np

    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    emb = load_table(spark, path, "embeddings")
    n = emb.count()
    k = max(2, n // 512)
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


def semdedup_capped_legacy(spark, path: str):
    """The pre-r12 emb_semdedup: identical pipeline to the registry
    query (vectors.py:1038 prune closure mirrored verbatim) except
    k = max(2, min(4096, n // 512)) — the vestigial flat-kmeans cap
    whose frozen k makes the per-cluster pairwise term n²/k."""
    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    emb = load_table(spark, path, "embeddings")
    n = emb.count()
    k = max(2, min(4096, n // 512))
    assigned = hierarchical_kmeans_assign(emb, dims=DIMS, k=k).select(
        "vec_id", "label", "cluster", "embedding"
    )

    def prune(pdf):
        import numpy as np

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
        prune, "vec_id long, label int, cluster long"
    )


def semdedup_coarse_probe(spark, path: str):
    """PROBE-ONLY (r16, VERDICT r15 item 5): the FAISS-style nlist≈√n
    granularity — k = ceil(sqrt(n)) final clusters, cluster size grows
    as √n. OUTPUT-CHANGING (coarser granularity drops more near-dups),
    so it can never replace the registry emb_semdedup; it exists to
    price the named escape from the k=n/512 assignment asymptote
    (docs/scale.md "SemDeDup levels=3 at 32M"): assignment cost falls
    (fewer, coarser cells), per-cell pairwise cost rises (≈√n members
    per final cluster). Same fused refine+prune shape as the registry
    query so the A/B isolates granularity alone."""
    import math

    import numpy as np

    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.clustering import (
        assign_euclid_udf,
        ceil_root,
        kmeans_fit,
        local_tree_assign,
        tree_width,
    )
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    emb = load_table(spark, path, "embeddings")
    n = emb.count()
    k = max(2, math.isqrt(n))
    levels = 3
    coarse_iters, fine_iters, coarse_cap = 2, 4, 4096
    k1 = min(coarse_cap, ceil_root(k, 2))
    k_rem = -(-k // k1)
    coarse = kmeans_fit(emb, DIMS, k=k1, iters=coarse_iters)
    assigned = emb.withColumn(
        "__cell", assign_euclid_udf(coarse)(F.col("embedding"))
    ).select("vec_id", "label", "__cell", "embedding")
    w_rem = tree_width(k_rem, levels - 1)
    depth = levels - 1

    def refine_prune(pdf):
        import pandas as pd  # noqa: F401

        cell = int(pdf["__cell"].iloc[0])
        pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]],
            dtype=np.float64,
        )
        if k_rem <= 1:
            cl = np.zeros(len(pdf), dtype=np.int64)
        else:
            cl = local_tree_assign(mat, k_rem, depth, coarse_iters, fine_iters)
        cluster = cell * w_rem + cl
        keep_mask = np.ones(len(pdf), dtype=bool)
        for cid in np.unique(cluster):
            sel = np.nonzero(cluster == cid)[0]
            sub = mat[sel]
            norms = np.sqrt((sub**2).sum(axis=1))
            norms[norms == 0.0] = 1.0
            unit = sub / norms[:, None]
            sims = unit @ unit.T
            c = len(sel)
            iu = np.triu_indices(c, k=1)
            drop = np.zeros(c, dtype=bool)
            hits = sims[iu] >= 0.95
            np.logical_or.at(drop, iu[1][hits], True)
            keep_mask[sel[drop]] = False
        out = pdf.loc[keep_mask, ["vec_id", "label"]].copy()
        out["cluster"] = cluster[keep_mask].astype(np.int64)
        # probe-only extra: this cell's group size, so the driver can
        # take max() without a second assignment pass (VERDICT r15
        # item 5: record peak per-cell group size — the §5 spill unit)
        out["cell_rows"] = len(pdf)
        return out

    return assigned.groupBy("__cell").applyInPandas(
        refine_prune, schema="vec_id long, label int, cluster long, cell_rows long"
    )


def semdedup_cell_stats(spark, path: str):
    """One assignment-only pass reporting the SHIPPED emb_semdedup
    per-cell group-size distribution (max/p99/mean) — the §5 spill
    unit the r15 fusion widened from one final cluster to one level-1
    cell. Stats job, not a timed arm."""
    from chrono_ts_spark.catalog import load_table
    from chrono_ts_spark.operators.clustering import (
        assign_euclid_udf,
        ceil_root,
        kmeans_fit,
    )
    from chrono_ts_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    emb = load_table(spark, path, "embeddings")
    n = emb.count()
    k = max(2, n // 512)
    k1 = min(4096, ceil_root(k, 2))
    coarse = kmeans_fit(emb, DIMS, k=k1, iters=2)
    cells = (
        emb.withColumn("__cell", assign_euclid_udf(coarse)(F.col("embedding")))
        .groupBy("__cell")
        .count()
    )
    row = cells.agg(
        F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.avg("count").alias("mean"),
        F.count(F.lit(1)).alias("n_cells"),
    ).collect()[0]
    return {
        "n": n, "k1": k1, "max_cell": row["max"], "p99_cell": row["p99"],
        "mean_cell": round(row["mean"], 1), "n_cells": row["n_cells"],
    }


def main() -> int:
    mode = sys.argv[1]
    vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    variant = sys.argv[3] if len(sys.argv) > 3 else {
        "lsh": "narrow", "semdedup": "uncapped", "ivf": "fused",
        "fit": "partial", "pqfit": "partial", "pq": "rerank",
    }[mode]

    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark

    spark = get_spark("ann-scale-probe")
    path = _corpus(spark, vecs)

    if mode in ("fit", "pqfit"):
        sec, digest = (run_fit if mode == "fit" else run_pqfit)(
            spark, path, variant
        )
        print(json.dumps({
            "mode": mode, "variant": variant, "vecs": vecs,
            "centroid_md5": digest, "sec": sec,
        }))
        return 0

    t0 = time.time()
    if mode == "lsh":
        df = run_lsh(spark, path, variant)
    elif mode == "ivf":
        df = run_ivf(spark, path, variant)
    elif mode == "pq":
        df = run_pq(spark, path, variant)
    elif variant == "cellstats":
        stats = semdedup_cell_stats(spark, path)
        stats.update({"mode": mode, "variant": variant, "vecs": vecs})
        print(json.dumps(stats))
        return 0
    elif variant == "coarse":
        df = semdedup_coarse_probe(spark, path)
        agg = df.agg(
            F.count(F.lit(1)).alias("out_rows"),
            F.max("cell_rows").alias("max_cell"),
        ).collect()[0]
        sec = round(time.time() - t0, 1)
        print(json.dumps({
            "mode": mode, "variant": variant, "vecs": vecs,
            "out_rows": agg["out_rows"], "max_cell": agg["max_cell"],
            "sec": sec,
        }))
        return 0
    elif variant == "uncapped":
        df = load_all()["emb_semdedup"].fn(spark, path)
    elif variant == "two_stage":
        df = semdedup_two_stage_r14(spark, path)
    else:
        df = semdedup_capped_legacy(spark, path)
    out_rows = df.count()
    sec = round(time.time() - t0, 1)
    print(json.dumps({
        "mode": mode, "variant": variant, "vecs": vecs,
        "out_rows": out_rows, "sec": sec,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Product quantization (PQ) for embedding compression + ADC search.

Complements the scalar int8 path (queries/vectors.py emb_quantize_int8)
and the LSH/IVF ANN operators (operators/similarity.py): vectors are
split into `m_sub` subspaces, each subspace gets its own K-centroid
codebook (deterministic Lloyd, same discipline as ivf_fit_centroids —
int64 fixed-point partial sums merged decimal-exact, so centroids are
shuffle-order independent), and every vector compresses to m_sub codes
(64 float32 dims → 8 bytes at m_sub=8/K=16 vs 256 bytes raw).

Search is asymmetric distance computation (ADC): each query
precomputes an (m_sub × K) table of squared subspace distances to
every centroid; a corpus vector's approximate squared L2 distance is
the sum of m_sub table lookups on its codes — no decompression.

Scale shape: fitting collects only K×dims centroid sums per iteration
(bounded, like IVF); encoding is one Arrow-batched pandas UDF pass
(map-side, no shuffle); ADC scans codes (bytes, not vectors) with the
query tables shipped in the UDF closure (few-probe assumption, same as
brute_force_topk), then TakeOrdered-style per-query top-k. The classic
production follow-up — re-rank the ADC top-R with exact distances —
is `pq_adc_topk(..., rerank=...)`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import guard_int64_partials
from .topk import top_k_per_group


def _check_geometry(dims: int, m_sub: int) -> int:
    if dims % m_sub:
        raise ValueError(f"dims={dims} not divisible by m_sub={m_sub}")
    return dims // m_sub


def _encode_np(mat: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(B, dims) float64 → (B, m_sub) int32 codes (argmin squared L2
    per subspace; ties break to the lowest centroid id)."""
    m_sub, _, sub = codebook.shape
    codes = np.empty((mat.shape[0], m_sub), dtype=np.int32)
    for m in range(m_sub):
        seg = mat[:, m * sub : (m + 1) * sub]
        # (B, K): ||x||^2 - 2 x.c + ||c||^2 ; argmin unaffected by ||x||^2
        d = -2.0 * seg @ codebook[m].T + (codebook[m] ** 2).sum(axis=1)
        codes[:, m] = np.argmin(d, axis=1)
    return codes


def _pq_partial_sums_fn(codebook: np.ndarray, dims: int, vec_col: str):
    """One PQ Lloyd round's map side: per ARROW BATCH, encode every
    vector (``_encode_np`` — byte-identical math to pq_encode_udf)
    and, for each subspace, accumulate a k × sub int64 matrix of 1e-9
    HALF-UP fixed-point coordinate sums plus per-code counts; emit
    m_sub·k·sub tiny (m, c, pos, s, n) rows with pos in GLOBAL dim
    coordinates (m·sub + local), matching the legacy explode's keying.

    Same rewrite as similarity._ivf_partial_sums_fn (r14): the shuffle
    carries O(m_sub × k × sub × batches) = O(k × dims × batches)
    integers per round instead of the posexploded O(rows × dims)
    (m, c, pos, val) triples. Quantization/ulp contract and the
    decimal(38,0)+Fraction driver merge are shared with the IVF
    rewrite — see _ivf_partial_sums_fn's docstring; the 8M IVF probe
    hashed bit-identical to the decimal(18,9) path, and
    tools/ann_scale_probe.py pqfit records the same check here.
    """
    cb = codebook.copy()
    m_sub, k, sub = cb.shape

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = _encode_np(mat, cb)
            q = guard_int64_partials(
                np.floor(np.abs(mat) * 1e9 + 0.5) * np.sign(mat)
            )
            cols_m, cols_c, cols_pos, cols_s, cols_n = [], [], [], [], []
            for m in range(m_sub):
                cl = codes[:, m]
                sums = np.zeros((k, sub), dtype=np.int64)
                np.add.at(sums, cl, q[:, m * sub : (m + 1) * sub])
                cnt = np.bincount(cl, minlength=k)
                present = np.nonzero(cnt)[0]
                n_rows = len(present) * sub
                cols_m.append(np.full(n_rows, m, dtype=np.int32))
                cols_c.append(np.repeat(present, sub).astype(np.int32))
                cols_pos.append(
                    np.tile(
                        np.arange(m * sub, (m + 1) * sub, dtype=np.int32),
                        len(present),
                    )
                )
                cols_s.append(sums[present].reshape(n_rows))
                cols_n.append(np.repeat(cnt[present], sub))
            yield pd.DataFrame(
                {
                    "m": np.concatenate(cols_m),
                    "c": np.concatenate(cols_c),
                    "pos": np.concatenate(cols_pos),
                    "s": np.concatenate(cols_s),
                    "n": np.concatenate(cols_n),
                }
            )

    return fn


def pq_fit(
    corpus: DataFrame,
    dims: int,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic PQ codebook (m_sub, k, dims/m_sub).

    Init = every (n/k)-th vector by id sliced into subspaces; each
    Lloyd round is ONE Spark job covering all subspaces — mapInPandas
    int64 partial sums per (subspace, code, dim), merged decimal-exact
    (r14, _pq_partial_sums_fn; only k×dims sums reach the driver)."""
    sub = _check_geometry(dims, m_sub)
    n = corpus.count()
    stride = max(1, n // k)
    init_rows = (
        corpus.filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if len(init_rows) < k:
        # sparse / non-contiguous id spaces can leave the modulo probe
        # short: fall back to the first k rows by id (deterministic,
        # layout-independent)
        init_rows = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")
    codebook = np.array(
        [[list(r[0])[m * sub : (m + 1) * sub] for r in init_rows] for m in range(m_sub)],
        dtype=np.float64,
    )  # (m_sub, k, sub)

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(corpus.sparkSession)

    for _ in range(iters):
        partials = corpus.select(vec_col).mapInPandas(
            _pq_partial_sums_fn(codebook, dims, vec_col),
            schema="m int, c int, pos int, s long, n long",
        )
        sums = (
            partials.groupBy("m", "c", "pos")
            # decimal-exact merge, Fraction conversion on the driver —
            # the shared r14 discipline (see _pq_partial_sums_fn)
            .agg(
                F.sum(F.col("s").cast("decimal(38,0)")).alias("s"),
                F.sum("n").alias("cnt"),
            )
            .collect()
        )
        from fractions import Fraction

        new = codebook.copy()
        for m in range(m_sub):
            rows = [r for r in sums if r.m == m]
            by_c: dict[int, np.ndarray] = {}
            n_c: dict[int, int] = {}
            for r in rows:
                by_c.setdefault(r.c, np.zeros(sub))[r.pos - m * sub] = float(
                    Fraction(int(r.s), 10**9)
                )
                n_c[r.c] = r.cnt
            for cid, vec in by_c.items():
                new[m, cid] = vec / max(n_c[cid], 1)
        codebook = new
    return codebook


def pq_encode_udf(codebook: np.ndarray):
    """pandas UDF: embedding array → m_sub int codes."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    cb = codebook.copy()

    @pandas_udf(ArrayType(IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy()).astype(np.float64)
        codes = _encode_np(mat, cb)
        return pd.Series([row.tolist() for row in codes])

    return encode


def pq_encode(
    corpus: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id_col, codes array<int>] — the compressed corpus."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(corpus.sparkSession)
    enc = pq_encode_udf(codebook)
    return corpus.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    k: int = 5,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query approximate top-k by ADC over PQ codes.

    With rerank=R > 0, the ADC top-R candidates are re-scored with the
    exact squared L2 distance (joining the raw vectors back for the
    candidates only) before the final top-k — the standard
    quality-recovery stage.
    """
    m_sub = codebook.shape[0]
    q_rows = queries.select(id_col, vec_col).collect()
    tables = {}
    for r in q_rows:
        qv = np.array(list(r[1]), dtype=np.float64)
        sub = codebook.shape[2]
        tab = np.empty((m_sub, codebook.shape[1]))
        for m in range(m_sub):
            seg = qv[m * sub : (m + 1) * sub]
            tab[m] = ((codebook[m] - seg) ** 2).sum(axis=1)
        tables[r[0]] = tab

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(corpus.sparkSession)

    codes_df = pq_encode(corpus, codebook, id_col, vec_col)
    arange = np.arange(m_sub)
    # r15 (the VERDICT r14 watch item): cap the scored output AT THE
    # BATCH. The previous pass emitted one corpus-length frame per
    # probe per batch — O(corpus × P) rows into the top-k shuffle,
    # P-proportional and the reason the 16M doubling read 2.17×. A
    # per-batch partial top-cap selection under the SAME total order
    # the global rank uses — (adc_dist, neighbor_id) lexicographic, so
    # boundary ties cannot drop a row the global top-k would keep —
    # emits ≤ P·cap rows per batch instead; top-k of a union equals
    # top-k over per-part top-k's, so the final rows are identical
    # (pinned in tests/test_pq.py). The self-match filter moves inside
    # the selection (masked before the cap) — filter-then-topk must
    # commute with the cap, and it no longer ships rows just to drop
    # them.
    cap = max(k, rerank)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            for qid, tab in tables.items():
                d = tab[arange[None, :], codes].sum(axis=1)
                mask = ids != qid
                dm, im = d[mask], ids[mask]
                if len(im) > cap:
                    sel = np.lexsort((im, dm))[:cap]
                    dm, im = dm[sel], im[sel]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(im), qid, dtype=np.int64),
                        "neighbor_id": im,
                        "adc_dist": dm,
                    }
                )

    scored = codes_df.mapInPandas(
        score, "query_id long, neighbor_id long, adc_dist double"
    )

    if not rerank:
        return top_k_per_group(
            scored,
            group=["query_id"],
            order=[F.col("adc_dist").asc(), F.col("neighbor_id")],
            k=k,
        )

    candidates = top_k_per_group(
        scored,
        group=["query_id"],
        order=[F.col("adc_dist").asc(), F.col("neighbor_id")],
        k=rerank,
    )
    # exact re-rank: join raw vectors back for candidates only.
    # r16 (guide §3.1/§8): the candidate side is contractually tiny
    # (≤ P·max(k, rerank) rows — probes are few by the operator's
    # contract), but its size ESTIMATE descends from the whole opaque
    # ADC pipeline, so the static plan chose a SortMergeJoin whose
    # build-side Exchange hash-partitioned the FULL corpus of raw
    # vectors (~0.5 KB/row) just to attach 64-dim arrays to a few
    # hundred rows — the §8 "second payload shuffle" trap; relying on
    # AQE to notice at runtime is fragile exactly when the corpus
    # shuffle is most expensive. Explicit broadcast: the corpus side
    # is scanned, never shuffled. Rows identical (md5-compared at 32M;
    # batch-invariance pins in tests/test_pq.py unaffected).
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__nv"),
    )
    qmap = {r[0]: np.array(list(r[1]), dtype=np.float64) for r in q_rows}

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf["__nv"].to_numpy())
            qs = np.vstack([qmap[q] for q in pdf["query_id"]])
            d = ((mat - qs) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "l2_sq": d,
                }
            )

    exact_scored = (
        F.broadcast(candidates).join(vecs, "neighbor_id")
        .select("query_id", "neighbor_id", "__nv")
        .mapInPandas(exact, "query_id long, neighbor_id long, l2_sq double")
    )
    return top_k_per_group(
        exact_scored,
        group=["query_id"],
        order=[F.col("l2_sq").asc(), F.col("neighbor_id")],
        k=k,
    )

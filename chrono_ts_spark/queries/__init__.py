"""Query registry — the single source of truth behind __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers here as a named
query (Spark callable) plus, when SQL-expressible, the equivalent
DuckDB oracle SQL. The driver runs both sides at sf0.01 and compares
row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- aggregates use the decimal-exact helpers (chrono_ts_spark.functions)
  so floating-point results are order-independent and bit-identical;
- timestamps cross the boundary as strings or epoch integers.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


_MODULES = [
    "timeseries",
    "relational",
    "scalar_funcs",
    "text",
    "vectors",
    "streaming_queries",
    "extras",
]

# The driver's correctness harness verifies the FIRST 50 registry entries
# per round, so ordering is coverage policy, not cosmetics.  Round-8
# rotation (docs/coverage.md "Round-8 window plan", executed verbatim —
# the r7 window landed 50/50 green so no fix re-witness is owed): all
# 50 slots go to never-driver-witnessed oracled queries, newest
# correctness machinery first — (1) the r7 engine-portable twins and
# span family, (1b) the late-r7 rows-only->oracled conversions, (1c)
# the fixed-point-Lloyd / recursive-CTE-DP exact twins, (1d) the
# sketch/spectral twins, (1e) six of the stream-oracled family (a
# driver hash row here witnesses watermarks, state stores and join
# buffers end to end — the highest-information rows on the board),
# then (2) ten from the oracled backlog in registration order. The
# r4–r7 green rows (<=3 rounds old) rotate back starting r9.
_WINDOW_50 = [
    # -- (1) r7 additions/upgrades, never witnessed --
    "doc_minhash_md5",
    "emb_ann_md5",
    "doc_simhash_md5_neighbors",
    "doc_repeated_spans",
    "doc_span_dedup_stats",
    "ts_theil_sen_windowed",
    "ts_ema_alpha_sweep",
    # -- (1b) late-r7 rows-only -> oracled conversions --
    "emb_knn_eval",
    "emb_matryoshka_eval",
    "emb_contrastive_pairs",
    "emb_intrinsic_dim",
    "emb_label_medoid",
    "ts_hurst_exponent",
    "emb_mmr_diversify",
    "ts_dtw_pairs",
    "ts_dominant_period",
    "rel_soundex_blocking",
    # -- (1c) fixed-point Lloyd / recursive-CTE DP exact twins --
    "doc_weighted_sample",
    "ts_pelt_segments",
    "ts_pelt_bounded",
    "diag_lsh_buckets_md5",
    "io_footer_totals",
    "emb_kmeans_exact",
    "emb_ann_ivf_exact",
    "emb_pq_exact",
    "emb_recall_eval_md5",
    "emb_semdedup_exact",
    # -- (1d) sketch/spectral twins --
    "doc_stemmed_terms",
    "rel_hll_md5",
    "doc_cms_heavy_md5",
    "emb_pca_power_exact",
    "doc_rle_ratio",
    "ts_qdigest_quantiles",
    "ts_rolling_actives_hll_md5",
    # -- (1e) stream-oracled family: streaming-engine witnesses --
    "stream_bucket_counts",
    "stream_session_windows",
    "stream_dedup_counts",
    "stream_stream_join",
    "stream_kalman",
    "stream_cusum",
    # -- (2) oracled backlog, registration order --
    "ts_rolling_actives",
    "ts_theil_sen",
    "ts_sax_symbols",
    "ts_weekly_profile",
    "ts_local_day_agg",
    "ts_event_trigrams",
    "ts_ks_drift",
    "ts_welch_t_pairs",
    "ts_type_user_jaccard",
    "pipeline_alert_rules",
]


# Callbacks run by load_all AFTER every module has imported — for the
# rare oracle that references another query's oracle text across the
# module load order (e.g. stream_holt wraps ts_holt_linear's SQL, but
# extras.py loads after streaming_queries.py). Each binder must be
# idempotent.
LATE_BINDERS: list[Callable[[], None]] = []


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry.

    The returned dict is ordered: the 50-query verification window first
    (in ``_WINDOW_50`` order), then every remaining query in registration
    order.  ``__spark_entry__.queries()`` preserves this order, which is
    what the driver's first-50 correctness cap sees.
    """
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    for binder in LATE_BINDERS:
        binder()
    missing = [n for n in _WINDOW_50 if n not in REGISTRY]
    if missing:
        raise LookupError(f"_WINDOW_50 names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _WINDOW_50}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered

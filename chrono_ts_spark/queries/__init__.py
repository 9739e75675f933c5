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
# per round, so ordering is coverage policy, not cosmetics.  Round-7
# rotation (VERDICT r6 item 3): (a) the three r6-crashing array-output
# queries, now serialized to scalar columns on both sides — kept in the
# window so CORRECTNESS_r07 witnesses the fix; (b) all 46 r4-green rows
# — the oldest driver rows on the board (3 rounds stale); (c) one
# top-up from the never-driver-checked set: ts_lttb_downsample, which
# gains its recursive-CTE oracle this round (VERDICT r6 item 4c), so
# the window is 50/50 oracled with zero no_oracle rows. Everything
# outside is r5/r6-green (<=2 rounds old) plus standing pytest
# coverage; the r5/r6 rows rotate back in r8.
_WINDOW_50 = [
    # -- (a) r6 array-crash fixes, re-witnessed --
    "doc_inverted_index",
    "doc_simhash_md5",
    "doc_index_incremental",
    # -- (b) r4-green rows, oldest on the board --
    "io_csv_scan",
    "io_json_scan",
    "io_partitioned_sink",
    "sql_entry_star_join",
    "udaf_median_price",
    "udf_grouped_trend",
    "udtf_bigrams",
    "sf_map_funcs",
    "rel_full_outer_balance",
    "rel_cube_sales",
    "rel_median_mode",
    "rel_window_values",
    "doc_dedup_stats",
    "doc_dup_pairs",
    "doc_dedup_keep_first",
    "doc_quality",
    "doc_fingerprints",
    "doc_lang_id_confusion",
    "doc_ngram_jaccard_adjacent",
    "doc_winnow_fingerprints",
    "pipeline_clean_corpus",
    "emb_norms",
    "emb_cosine_topk",
    "emb_label_centroids",
    "emb_cosine_near_dups",
    "ts_downsample_tier",
    "ts_value_histogram",
    "rel_collect_priorities",
    "sf_array_funcs",
    "ts_rolling_zscore",
    "rel_top_supplier_revenue",
    "doc_tfidf_top_terms",
    "doc_pii_scrub",
    "doc_chunk_tokens",
    "doc_dup_clusters",
    "doc_hash_sample",
    "doc_decontaminate",
    "doc_pack_sequences",
    "emb_quantize_int8",
    "rel_promo_revenue",
    "rel_disjunctive_revenue",
    "rel_market_share",
    "rel_only_late_supplier",
    "rel_idle_rich_customers",
    "ts_asof_join",
    "rel_pricing_summary",
    # -- (c) newly oracled top-up --
    "ts_lttb_downsample",
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

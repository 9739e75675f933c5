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
    # Declared output schema (Spark DDL string) for queries whose
    # CONSTRUCTION executes Spark jobs (driver-side fits/collects: the
    # fixed-point Lloyd family, iterative connected components, the
    # q-digest histogram, the erasure audit, ...). The contract lint
    # (tests/test_entry_contract.py) checks the declaration statically
    # instead of building those plans, so linting launches zero jobs;
    # tools/oracle_check.py asserts declaration == actual schema on
    # every sweep, so a drifted declaration cannot survive a round.
    out_schema: str | None = None


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    out_schema: str | None = None,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, tuple(tags), fn.__doc__ or "", out_schema
        )
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
# per round, so ordering is coverage policy, not cosmetics.  Round-11
# rotation (docs/coverage.md "Round-11 window", executed verbatim — the
# r10 window landed 50/50 green so no fix re-witness is owed): (1) the
# full 35-query oracled backlog, rel_price_percentiles_ranged first
# (newest machinery first, the standing pattern) then registration
# order — landing these green EMPTIES the oracled backlog: every
# oracled query in the registry will then have a driver hash row;
# (2) the first 15 (registration order) of the 17 never-witnessed
# rows-only queries, each taking its first driver rows-only row
# (io_footer_stats and io_sorted_write are the 2 left for r12).
_WINDOW_50 = [
    # -- (1) the oracled backlog: 35 queries, drained in full --
    "rel_price_percentiles_ranged",
    "sf_interval_funcs",
    "doc_pmi_bigrams",
    "doc_sentence_stats",
    "doc_zipf_fit",
    "doc_canonical_dedup",
    "doc_rake_keywords",
    "doc_containment_adjacent",
    "doc_ngram_novelty",
    "doc_bigram_lm",
    "doc_jaccard_threshold_curve",
    "doc_lsh_s_curve",
    "doc_char_entropy",
    "doc_lix_readability",
    "doc_vocab_richness",
    "doc_ascii_ratio",
    "doc_prefix_dup_groups",
    "doc_dup_cluster_sizes",
    "emb_outliers",
    "emb_label_affinity",
    "emb_rp_project",
    "emb_centroid_drift",
    "emb_concentration",
    "emb_quantization_error",
    "emb_range_search",
    "emb_similarity_histogram",
    "ts_holt_winters",
    "ts_forecast_intervals",
    "dq_expectations",
    "diag_key_skew",
    "io_nested_json",
    "sql_recursive_reach",
    "io_csv_dialect",
    "dq_column_profile",
    "udtf_user_profile",
    # -- (2) rows-only first witnesses: 15 of 17, registration order --
    "ts_rolling_actives_approx",
    "rel_approx_percentiles",
    "doc_simhash",
    "doc_simhash_neighbors",
    "mm_features",
    "doc_heavy_tokens",
    "doc_compression_ratio",
    "emb_kmeans",
    "emb_semdedup",
    "emb_pca_variance",
    "emb_recall_eval",
    "diag_lsh_buckets",
    "stream_stream_join_left",
    "rel_approx_distinct",
    "rel_sample",
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

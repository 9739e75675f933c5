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
# per round, so ordering is coverage policy, not cosmetics.  Round-13
# rotation (docs/coverage.md "Round-13 window", backlog recomputed from
# CORRECTNESS_r01-r12 at round start + changed-since-witness recomputed
# from the r12 post-seal commits, per VERDICT r12 items 1 and 3):
# (1) the 3 CHANGED-SINCE-WITNESS front-loads — emb_semdedup
# (vectors.py k-cap removal, commit 65297f0) and emb_recall_eval
# (consumes the lsh_bucket_topk narrow-shuffle fix, commit 2014ee3)
# both changed AFTER their r11 driver rows, and emb_ann_lsh's plan
# changed AGAIN in r13 (fused Arrow bucket+cosine scoring — the 16M
# probe's interpreted-rerank fix) after its r12 row; (2) the 13
# remaining r5-cohort greens (8 rounds stale), registration order;
# (3) the first 34 of the r6 cohort, registration order.
# doc_rrf_fusion, sql_correlated_above_avg and doc_rrf_bm25 displace
# to the r14 ladder to make room for the front-loads.
_WINDOW_50 = [
    # -- (1) changed-since-witness front-loads (r12 post-seal + r13 ANN fix) --
    "emb_semdedup",
    "emb_recall_eval",
    "emb_ann_lsh",
    # -- (2) the 13 remaining r5-cohort staleness re-witnesses --
    "sf_math_funcs",
    "sf_conditional_funcs",
    "sf_json_funcs",
    "sf_hash_funcs",
    "doc_token_stats",
    "doc_repetition_filter",
    "doc_mixture_sample",
    "doc_split_assign",
    "doc_chunk_dedup",
    "pipeline_curate_corpus",
    "doc_feature_hash",
    "io_orc_scan",
    "io_schema_evolution",
    # -- (3) first 35 of the r6 cohort, registration order --
    "ts_ohlc_daily",
    "ts_m4_downsample",
    "ts_seasonal_baseline",
    "ts_value_drift_psi",
    "ts_sla_availability",
    "ts_tier_routed_daily",
    "ts_bucket_percentiles",
    "ts_mad_outliers",
    "ts_topk_users",
    "ts_asof_join_forward",
    "ts_salted_agg",
    "ts_series_corr",
    "ts_burst_detect",
    "rel_top_revenue_orders",
    "rel_order_priority_counts",
    "rel_nation_revenue",
    "rel_revenue_forecast",
    "rel_customers_without_orders",
    "rel_big_spender_customers",
    "rel_nation_pairs",
    "rel_nations_cust_and_supp",
    "rel_pivot_status",
    "rel_top_orders_per_cust",
    "rel_cust_running_total",
    "rel_first_last_order",
    "rel_large_volume_customers",
    "rel_below_avg_quantity",
    "rel_returned_revenue_customers",
    "rel_nation_trade_volume",
    "rel_priority_lateness",
    "sf_agg_predicates",
    "doc_top_terms",
    "doc_bm25",
    "doc_unigram_logprob",
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

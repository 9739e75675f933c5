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
# per round, so ordering is coverage policy, not cosmetics.  Round-5
# rotation (docs/coverage.md items 4-5): (a) the 24 oracled queries
# registered after the round-2 window froze that have never received a
# driver row; (b) the 7 queries un-broken by the round-5 TIMESTAMP_NTZ
# normalization fix, kept in-window so the fix is proven by fresh driver
# rows (4 more NTZ-fixed queries — ts_time_weighted_avg,
# ts_cohort_retention, ts_rollup_incremental, ts_zorder_values — are
# already in (a)); (c) round-1-green keepers evicted since round 2,
# rotating back so nothing goes >3 rounds without a fresh row.  Every
# query outside the window has a green driver row in r1/r2/r4 plus
# standing pytest coverage.
_WINDOW_50 = [
    # -- (a) oracled, never driver-checked (registered after r2 froze) --
    "rel_part_pagerank",
    "ts_winsorized_stats",
    "ts_time_weighted_avg",
    "rel_fuzzy_part_names",
    "io_schema_evolution",
    "doc_feature_hash",
    "ts_scd2_user_state",
    "ts_cusum_alarms",
    "ts_zorder_values",
    "doc_split_assign",
    "doc_chunk_dedup",
    "rel_grouping_sets",
    "ts_funnel_steps",
    "ts_cohort_retention",
    "io_orc_scan",
    "ts_rolling_autocorr",
    "ts_event_pattern",
    "rel_bloom_join_revenue",
    "doc_repetition_filter",
    "doc_mixture_sample",
    "ts_rollup_incremental",
    "pipeline_curate_corpus",
    "ts_pit_join_status",
    "ts_salted_join_enrich",
    # -- (b) NTZ-fix proof: crashed in r3/r4, normalized in r5 --
    "ts_bucket_agg",
    "ts_sessionize",
    "ts_range_join_left",
    "ts_range_join_counts",
    "ts_interval_overlap",
    "ts_rate",
    "ts_gapfill_locf",
    # -- (c) r1-green evicted keepers rotating back (last row: r1) --
    "sf_string_funcs",
    "sf_datetime_funcs",
    "sf_math_funcs",
    "sf_conditional_funcs",
    "sf_json_funcs",
    "sf_hash_funcs",
    "doc_token_stats",
    "rel_stats_moments",
    "rel_filter_project",
    "ts_cumsum",
    "rel_brand_stats",
    "rel_rollup_sales",
    "rel_price_percentiles",
    "rel_cust_order_histogram",
    "rel_order_gap_days",
    "rel_acctbal_distribution",
    "rel_union_nationkeys",
    "rel_nations_cust_not_supp",
    "rel_distinct_type_brand",
]


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry.

    The returned dict is ordered: the 50-query verification window first
    (in ``_WINDOW_50`` order), then every remaining query in registration
    order.  ``__spark_entry__.queries()`` preserves this order, which is
    what the driver's first-50 correctness cap sees.
    """
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    missing = [n for n in _WINDOW_50 if n not in REGISTRY]
    if missing:
        raise LookupError(f"_WINDOW_50 names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _WINDOW_50}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered

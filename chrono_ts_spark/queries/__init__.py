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
# per round, so ordering is coverage policy, not cosmetics.  Round-12
# rotation (docs/coverage.md "Round-12 window", executed verbatim;
# backlog recomputed from CORRECTNESS_r01–r11 at round start — it
# matches the written plan): (1) the last 2 never-witnessed rows-only
# queries; (2) the r11 DOULION swap's first driver row; (2b) the 3
# CHANGED-SINCE-WITNESS re-witnesses whose r10 hash rows predate their
# r11 decimal rewrites; (3) the 7 r6-stale rows-only re-witnesses;
# (4) 37 staleness re-witnesses of oracled greens, OLDEST last-witness
# first (the r5 cohort, 7 rounds stale), registration order within the
# round.  sf_math/conditional/json_funcs move to the r13 ladder to keep
# 50 slots.
_WINDOW_50 = [
    # -- (1) last 2 never-witnessed rows-only --
    "io_footer_stats",
    "io_sorted_write",
    # -- (2) first driver row for the r11 G2+ DOULION swap --
    "rel_triangle_doulion",
    # -- (2b) changed-since-witness: r11 decimal rewrites --
    "rel_abc_analysis",
    "rel_abc_xyz",
    "rel_market_basket",
    # -- (3) the 7 r6-stale rows-only re-witnesses --
    "doc_minhash_near_dups",
    "emb_ann_ivf",
    "emb_ann_lsh",
    "emb_pq_topk",
    "io_binary_scan",
    "mm_byte_features",
    "ts_value_quantile_sketch",
    # -- (4) 37 staleness re-witnesses, r5 cohort, registration order --
    "ts_bucket_agg",
    "ts_rate",
    "ts_sessionize",
    "ts_cumsum",
    "ts_gapfill_locf",
    "ts_range_join_counts",
    "ts_range_join_left",
    "ts_interval_overlap",
    "ts_scd2_user_state",
    "ts_cusum_alarms",
    "ts_zorder_values",
    "ts_funnel_steps",
    "ts_cohort_retention",
    "ts_rolling_autocorr",
    "ts_event_pattern",
    "ts_rollup_incremental",
    "ts_pit_join_status",
    "ts_salted_join_enrich",
    "ts_winsorized_stats",
    "ts_time_weighted_avg",
    "rel_brand_stats",
    "rel_cust_order_histogram",
    "rel_union_nationkeys",
    "rel_nations_cust_not_supp",
    "rel_rollup_sales",
    "rel_order_gap_days",
    "rel_acctbal_distribution",
    "rel_stats_moments",
    "rel_price_percentiles",
    "rel_filter_project",
    "rel_distinct_type_brand",
    "rel_bloom_join_revenue",
    "rel_grouping_sets",
    "rel_fuzzy_part_names",
    "rel_part_pagerank",
    "sf_string_funcs",
    "sf_datetime_funcs",
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

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
# per round, so ordering is coverage policy, not cosmetics.  Round-10
# rotation (docs/coverage.md "Round-10 window plan", executed verbatim —
# the r9 window landed 50/50 green so no fix re-witness is owed): all
# 50 slots again go to never-driver-witnessed oracled queries — (1) the
# six r9 additions/conversions (the W12 binary-segmentation swap, the
# last oracled stream query, and the four structural-constants /
# declarative-final-state conversions), then (2) 44 from the oracled
# backlog in registration order.
_WINDOW_50 = [
    # -- (1) r9 additions / rows-only->oracled conversions --
    "ts_binseg_segments",
    "stream_ema",
    "io_csv_malformed",
    "io_compaction",
    "io_dynamic_overwrite",
    "gov_snapshot_diff",
    # -- (2) oracled backlog, registration order --
    "ts_time_of_day_circular",
    "ts_variance_ratio",
    "ts_user_hod_entropy",
    "ts_effective_sample_size",
    "ts_channel_breakouts",
    "rel_triangle_parts",
    "rel_stratified_sample",
    "rel_unpivot_metric_stats",
    "rel_division_all_priorities",
    "rel_skyline_orders",
    "rel_ols_coefficients",
    "rel_topk_with_ties",
    "rel_market_basket",
    "rel_rfm_segments",
    "rel_cohort_ltv",
    "rel_abc_analysis",
    "rel_cdc_compact",
    "rel_calendar_coverage",
    "rel_weighted_median",
    "rel_growth_rates",
    "rel_benford_law",
    "rel_nullsafe_join",
    "rel_moving_annual_total",
    "rel_clamped_balance",
    "rel_not_in_null_trap",
    "rel_ratio_to_report",
    "rel_mix_shift_chi2",
    "rel_segment_migration",
    "rel_ship_latency",
    "rel_hhi_concentration",
    "rel_discount_elasticity",
    "rel_price_volume_mix",
    "rel_basket_size_histogram",
    "rel_loo_target_encoding",
    "rel_duplicate_payments",
    "rel_new_vs_returning",
    "rel_abc_xyz",
    "rel_numeric_correlations",
    "sf_url_funcs",
    "sf_bitwise_funcs",
    "sf_masking_funcs",
    "sf_struct_funcs",
    "sf_encoding_funcs",
    "sf_try_funcs",
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

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
# per round, so ordering is coverage policy, not cosmetics.  Round-9
# rotation (docs/coverage.md "Round-9 window plan", executed verbatim —
# the r8 window landed 50/50 green so no fix re-witness is owed): all
# 50 slots again go to never-driver-witnessed oracled queries — (1) the
# four r8 additions/conversions (newest correctness machinery: the
# sampled Theil-Sen serving path, the foreachBatch MERGE tier, the
# burst-alert rule on that tier, and the erasure audit), (2) the five
# remaining never-witnessed stream queries (with r8's six plus item 1's
# two, this completes driver witness for the ENTIRE oracled streaming
# family), then (3) 41 from the oracled backlog in registration order.
_WINDOW_50 = [
    # -- (1) r8 additions / rows-only->oracled conversions --
    "ts_theil_sen_sampled",
    "stream_upsert_counts",
    "stream_alert_burst",
    "gov_forget_user",
    # -- (2) remaining never-witnessed stream queries --
    "stream_m4",
    "stream_sliding_counts",
    "stream_holt",
    "stream_running_extrema",
    "stream_static_enrich",
    # -- (3) oracled backlog, registration order --
    "ts_gorilla_size_estimate",
    "ts_xcorr_best_lag",
    "ts_entropy_by_type",
    "ts_order_inversions",
    "ts_attribution_last_touch",
    "ts_debounce",
    "ts_activity_streaks",
    "ts_burn_rate",
    "ts_rolling_median",
    "ts_kalman_filter",
    "ts_multi_resolution",
    "ts_seasonal_decompose",
    "ts_top_movers",
    "ts_interval_coverage",
    "ts_markov_transitions",
    "ts_attribution_linear",
    "ts_apdex",
    "ts_burstiness",
    "ts_incident_mttr",
    "ts_survival_km",
    "ts_acf",
    "ts_haar_energy",
    "ts_seasonality_strength",
    "ts_parkinson_volatility",
    "ts_peak_detection",
    "ts_missing_hours",
    "ts_ljung_box",
    "ts_anova_types",
    "ts_poisson_bootstrap_ci",
    "ts_max_drawdown",
    "ts_entropy_rate",
    "ts_quantile_table",
    "ts_stl_anomaly",
    "ts_rle_stats",
    "ts_value_shape",
    "ts_croston",
    "ts_expected_shortfall",
    "ts_naive_baselines",
    "ts_mann_whitney",
    "ts_record_counts",
    "ts_spearman_pairs",
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

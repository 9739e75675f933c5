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
# per round, so ordering is coverage policy, not cosmetics.  Round-6
# rotation (VERDICT r5 item 1 + docs/coverage.md "Round-5 additions"):
# (a) the six round-5 queries registered after the r5 window froze —
# never driver-checked; (b) every remaining round-1-green keeper (last
# driver row: r1, now five rounds stale — the oldest rows anywhere);
# (c) every other registry query that has NEVER had a driver row: the
# rows-only-by-design set (streaming equivalence queries, seeded
# sampling, sketches, ANN, minhash/simhash) — the driver records the
# weaker rows-only check for these, converting "pytest-only" into
# "driver-witnessed" for the whole family; (d) queries added in round 6.
# Everything outside the window is r4/r5-green (≤2 rounds old) plus
# standing pytest coverage; the 46 r4-green rows rotate back in r7.
_WINDOW_50 = [
    # -- (a) round-5 additions, never driver-checked --
    "ts_ema",
    "ts_series_corr",
    "ts_burst_detect",
    "doc_inverted_index",
    "doc_rrf_fusion",
    "io_binary_scan",
    # -- (d) round-6 additions --
    "mm_byte_features",
    "ts_m4_downsample",
    "ts_seasonal_baseline",
    "ts_holt_linear",
    "doc_bm25",
    "doc_simhash_md5",
    "ts_mad_outliers",
    "ts_bucket_percentiles",
    "ts_tier_routed_daily",
    "sql_correlated_above_avg",
    "doc_rrf_bm25",
    "doc_unigram_logprob",
    "sf_agg_predicates",
    "ts_forecast_backtest",
    "ts_sla_availability",
    "ts_value_drift_psi",
    # -- (b) r1-green keepers, five rounds stale --
    "doc_top_terms",
    "rel_below_avg_quantity",
    "rel_big_spender_customers",
    "rel_cust_running_total",
    "rel_customers_without_orders",
    "rel_first_last_order",
    "rel_large_volume_customers",
    "rel_nation_pairs",
    "rel_nation_revenue",
    "rel_nation_trade_volume",
    "rel_nations_cust_and_supp",
    "rel_order_priority_counts",
    "rel_pivot_status",
    "rel_priority_lateness",
    "rel_returned_revenue_customers",
    "rel_revenue_forecast",
    "rel_top_orders_per_cust",
    "rel_top_revenue_orders",
    "ts_asof_join_forward",
    "ts_ohlc_daily",
    "ts_salted_agg",
    "ts_topk_users",
    # -- (c) never-driver-checked rows-only set --
    "doc_minhash_near_dups",
    "emb_ann_lsh",
    "emb_ann_ivf",
    "emb_pq_topk",
    "ts_lttb_downsample",
    "ts_value_quantile_sketch",
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

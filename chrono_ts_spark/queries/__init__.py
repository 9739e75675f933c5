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


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return REGISTRY

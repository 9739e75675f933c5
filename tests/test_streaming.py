"""Streaming batch-equivalence harness (SURVEY.md §5.4): every
streaming op replayed with availableNow must equal the batch version
of the same logic on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.catalog import load_table
from chrono_ts_spark.queries import load_all
from tests.conftest import SF_SMOKE

REG = load_all()


def as_sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.slow
def test_tumbling_stream_equals_batch(spark):
    stream = REG["stream_bucket_counts"].fn(spark, SF_SMOKE)
    batch = REG["ts_bucket_agg"].fn(spark, SF_SMOKE)
    cols = ["bucket_ts", "event_type", "n_events", "sum_value", "min_value", "max_value", "avg_value"]
    assert as_sorted_rows(stream, cols) == as_sorted_rows(batch, cols)


@pytest.mark.slow
def test_session_stream_equals_batch_sessionize(spark):
    stream = REG["stream_session_windows"].fn(spark, SF_SMOKE)
    batch = REG["ts_sessionize"].fn(spark, SF_SMOKE)
    # session_window(start) == min(ts) of the batch gaps-and-islands session
    cols = ["user_id", "session_start", "n_events"]
    assert as_sorted_rows(stream, cols) == as_sorted_rows(
        batch.select("user_id", F.col("session_start"), "n_events"), cols
    )


@pytest.mark.slow
def test_dedup_stream_equals_batch_counts(spark):
    stream = REG["stream_dedup_counts"].fn(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events").dropDuplicates(["event_id"])
    batch = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    cols = ["event_type", "n_events"]
    assert as_sorted_rows(stream, cols) == as_sorted_rows(batch, cols)


@pytest.mark.slow
def test_sliding_stream_equals_batch(spark):
    stream = REG["stream_sliding_counts"].fn(spark, SF_SMOKE)
    # batch equivalent: each event belongs to 2 sliding windows (600/300)
    from chrono_ts_spark.functions import time_bucket, ts_str

    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        ev.select(
            F.explode(
                F.array(
                    time_bucket(F.col("ts"), 300),
                    time_bucket(F.col("ts"), 300) - F.expr("INTERVAL 300 SECONDS"),
                )
            ).alias("win_start"),
            "event_type",
        )
        .groupBy(ts_str(F.col("win_start")).alias("win_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cols = ["win_start", "event_type", "n_events"]
    assert as_sorted_rows(stream, cols) == as_sorted_rows(batch, cols)


@pytest.mark.slow
def test_stream_stream_join_equals_batch(spark):
    stream = REG["stream_stream_join"].fn(spark, SF_SMOKE)
    from chrono_ts_spark.functions import ts_str

    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    batch = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 600 SECONDS"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        "user_id", "p_id",
        ts_str(F.col("p_ts")).alias("p_ts_s"),
        ts_str(F.col("c_ts")).alias("c_ts_s"),
    )
    cols = ["user_id", "p_id", "p_ts_s", "c_ts_s"]
    assert as_sorted_rows(stream, cols) == as_sorted_rows(batch, cols)


@pytest.mark.slow
def test_ema_stream_equals_batch(spark):
    from chrono_ts_spark.streaming.stateful import batch_ema

    stream = REG["stream_ema"].fn(spark, SF_SMOKE)
    batch = batch_ema(spark, SF_SMOKE)
    cols = ["user_id", "event_id", "ts_s", "value", "ema"]
    s_rows = as_sorted_rows(stream, cols)
    b_rows = as_sorted_rows(batch, cols)
    assert len(s_rows) == len(b_rows)
    for srow, brow in zip(s_rows, b_rows):
        assert srow[:4] == brow[:4]
        assert srow[4] == pytest.approx(brow[4], rel=1e-12)


@pytest.mark.slow
def test_rate_source_smoke(spark):
    """S4: the built-in rate source works as an alternate ingest path."""
    import tempfile, uuid

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
    )
    name = "mem_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="chrono_rate_"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline and spark.table(name).count() == 0:
            time.sleep(0.5)
        assert spark.table(name).count() > 0
        assert set(spark.table(name).columns) == {"timestamp", "value"}
    finally:
        q.stop()

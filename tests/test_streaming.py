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

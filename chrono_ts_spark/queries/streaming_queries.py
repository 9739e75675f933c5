"""Streaming queries (SURVEY.md §2.9, rows-only in the driver gate).

DuckDB can't replay a stream, so these have no oracle entries; instead
tests/test_streaming.py asserts batch-equivalence: each replayed
result must exactly equal the batch version of the same logic (which
IS oracle-checked — ts_bucket_agg / ts_sessionize / exact counts).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..streaming import (
    run_sessionized_stream,
    run_stateful_dedup_stream,
    run_tumbling_counts_stream,
)
from . import query


@query("stream_bucket_counts", oracle=None, tags=("streaming", "ST2", "no-oracle"))
def stream_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 5-min tumbling aggregation over the replayed stream."""
    return run_tumbling_counts_stream(spark, sf_dir, 300)


@query("stream_m4", oracle=None, tags=("streaming", "ST2", "A7b", "no-oracle"))
def stream_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming M4 downsampling (r6): witness-point tiles per tumbling
    window — batch-equivalence vs ts_m4_downsample in tests."""
    from ..streaming.replay import run_m4_stream

    return run_m4_stream(spark, sf_dir, 900)


@query("stream_session_windows", oracle=None, tags=("streaming", "ST4", "no-oracle"))
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time session windows (30-min gap) over the replayed stream."""
    return run_sessionized_stream(spark, sf_dir, 1800)


@query("stream_dedup_counts", oracle=None, tags=("streaming", "ST5", "no-oracle"))
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup on event_id, then per-type counts.

    Rows-only: DuckDB cannot replay a stream; exact equivalence with
    the batch dedup aggregate is pinned in pytest."""
    return run_stateful_dedup_stream(spark, sf_dir)


@query("stream_sliding_counts", oracle=None, tags=("streaming", "ST3", "no-oracle"))
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min windows sliding every 5 min over the replayed stream."""
    from ..streaming.stateful import run_sliding_counts_stream

    return run_sliding_counts_stream(spark, sf_dir)


@query("stream_stream_join", oracle=None, tags=("streaming", "J7", "no-oracle"))
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join: purchases x clicks in 10 min."""
    from ..streaming.stateful import run_stream_stream_join

    return run_stream_stream_join(spark, sf_dir)


@query("stream_stream_join_left", oracle=None, tags=("streaming", "J7", "no-oracle"))
def stream_stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT watermarked stream-stream join (NULL clicks preserved);
    flushed-prefix-equivalent to batch range_join(how='left')."""
    from ..streaming.stateful import run_stream_stream_join_left

    return run_stream_stream_join_left(spark, sf_dir)


@query("stream_ema", oracle=None, tags=("streaming", "ST6", "no-oracle"))
def stream_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful op: per-user EMA via applyInPandasWithState.

    Rows-only: no stream replay in DuckDB; bit-exact equivalence with
    batch ts_ema (itself recursive-CTE-oracled) is pinned in pytest."""
    from ..streaming.stateful import run_ema_stream

    return run_ema_stream(spark, sf_dir)


@query("stream_holt", oracle=None, tags=("streaming", "ST6", "no-oracle"))
def stream_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful op (r6): per-user Holt linear level+trend via
    applyInPandasWithState — the streaming twin of ts_holt_linear,
    equivalence-tested bit-for-bit in tests/test_streaming.py."""
    from ..streaming.stateful import run_holt_stream

    return run_holt_stream(spark, sf_dir)


@query("stream_running_extrema", oracle=None, tags=("streaming", "ST6", "no-oracle"))
def stream_running_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas: per-user running min/max/count.

    Rows-only: no stream replay in DuckDB; exact equivalence with the
    batch window extrema is pinned in pytest."""
    from ..streaming.stateful import run_running_extrema_stream

    return run_running_extrema_stream(spark, sf_dir)


@query("stream_cusum", oracle=None, tags=("streaming", "ST6", "changepoint", "no-oracle"))
def stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online CUSUM chart per user (applyInPandasWithState; state = two
    doubles/key). Exact batch equivalence vs operators/changepoint.py
    with target=(mu, sigma) is pinned in tests/test_streaming.py."""
    from ..streaming.stateful import run_cusum_stream

    return run_cusum_stream(spark, sf_dir)


@query("stream_static_enrich", oracle=None, tags=("streaming", "J7", "no-oracle"))
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment join (stateless, no
    watermark; batch-equivalence pinned in tests/test_streaming.py)."""
    from ..streaming.replay import run_stream_static_enrich

    return run_stream_static_enrich(spark, sf_dir)


_RUN_TOKEN = uuid.uuid4().hex[:8]  # per-process isolation


def _stream_state_root(name: str) -> str:
    """Fixed per-process scratch root for a streaming query's keyed
    store, cleared up front (the _roundtrip_dir pattern): the returned
    DataFrame lazily reads the live generation, so the store cannot be
    deleted on exit — but a fresh mkdtemp per invocation leaked one
    full state copy per micro-batch per run (r7 review). One bounded
    copy per process instead."""
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(), f"chrono_{name}_state_{_RUN_TOKEN}"
    )
    shutil.rmtree(root, ignore_errors=True)
    return root


@query("stream_upsert_counts", oracle=None, tags=("streaming", "ST7b", "no-oracle"))
def stream_upsert_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7b (r6 late): UPDATE-mode window counts merged into a keyed
    parquet store via foreachBatch (generation-dir MERGE; Delta MERGE
    is the production swap-in). Final state == batch aggregation and
    batch re-application is a no-op — both pinned in
    tests/test_r6b_ops.py."""
    from ..streaming.upsert import run_upsert_counts, vacuum_generations

    root = _stream_state_root("upsert")
    state = run_upsert_counts(spark, sf_dir, root)
    # drop the per-micro-batch snapshots; the live generation (which
    # the returned plan reads) is retained by contract
    vacuum_generations(root, keep_last=1)
    return state


@query("stream_alert_burst", oracle=None, tags=("streaming", "ST7b", "alerting", "no-oracle"))
def stream_alert_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end streaming alert pipeline: events replay through
    the UPDATE-mode windowed aggregation into the keyed upsert store
    (the serving tier), and the burst rule — count > 3x the mean of
    the user's previous 12 active buckets — evaluates over that tier.
    Because the tier holds exactly the batch per-(user, bucket) counts
    (stream_upsert_counts' equivalence proof), the emitted alerts are
    pinned EQUAL to the batch ts_burst_detect rows in tests.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..streaming.upsert import run_upsert_counts, vacuum_generations

    root = _stream_state_root("alert")
    state = run_upsert_counts(spark, sf_dir, root)  # bucket_ts, user_id, n_events
    vacuum_generations(root, keep_last=1)
    w = Window.partitionBy("user_id").orderBy("bucket_ts").rowsBetween(-12, -1)
    t = state.select(
        "user_id",
        "bucket_ts",
        F.col("n_events").alias("cnt"),
        F.sum("n_events").over(w).alias("trail"),
        F.count(F.lit(1)).over(w).alias("n_trail"),
    )
    return t.filter(F.col("n_trail") == 12).select(
        "user_id",
        "bucket_ts",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("trail").cast("bigint").alias("trail"),
        (F.col("cnt") * 12 > F.col("trail") * 3).cast("int").alias("is_burst"),
    )


@query("stream_kalman", oracle=None, tags=("streaming", "ST6", "no-oracle"))
def stream_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful op (r6 late): per-user scalar Kalman filter via
    applyInPandasWithState — the streaming twin of ts_kalman_filter,
    equivalence-tested bit-for-bit in tests/test_r6c_ops.py."""
    from ..streaming.stateful import run_kalman_stream

    return run_kalman_stream(spark, sf_dir)

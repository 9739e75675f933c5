"""Kafka ingest path for the events stream (SURVEY §2 S4).

The sandbox has no network and no spark-sql-kafka connector jar, so the
*source wiring* here cannot be exercised end-to-end locally — but the
value of this module is split so everything except the socket is:

- :func:`parse_kafka_events` is a pure DataFrame→DataFrame transform
  from Kafka's wire schema (key/value binary, topic, partition, offset,
  timestamp) to the canonical events schema. It runs identically on a
  batch DataFrame, which is how tests/test_streaming.py pins it.
- :func:`kafka_events_stream` composes readStream.format("kafka") with
  that parser; on a cluster with the connector on the classpath it is
  the drop-in replacement for replay.replay_events_stream — every
  downstream stream_* query works unchanged (same schema, same
  watermark column).

Design notes for the 100 TB/day shape: one Kafka partition maps to one
Spark input partition (no repartition here — the per-key shuffle
belongs to the downstream stateful op, not ingest); JSON payload
parsing is from_json with a fixed schema (permissive mode: corrupt
records null out rather than kill the stream, and are countable via
``parsed.event_id IS NULL``); `maxOffsetsPerTrigger` bounds micro-batch
size so state-store checkpoints stay O(trigger), not O(backlog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_confs

# JSON payload schema on the wire (ts as epoch micros — binary-safe and
# timezone-free; producers stamp with the event time, not ingest time).
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka wire rows → canonical events rows.

    ``raw`` must carry Kafka's reader schema (at least ``value`` binary
    plus ``partition``/``offset``); works on batch or streaming frames.
    Output: event_id, ts (timestamp), user_id, event_type, value, props,
    plus kafka_partition/kafka_offset for exactly-once bookkeeping and
    ``is_corrupt`` for dead-letter accounting (from_json permissive
    nulls instead of failing the stream).
    """
    payload = F.from_json(F.col("value").cast("string"), PAYLOAD_SCHEMA)
    return raw.select(
        payload.alias("p"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
    ).select(
        F.col("p.event_id").alias("event_id"),
        F.timestamp_micros(F.col("p.ts_us")).alias("ts"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.event_type").alias("event_type"),
        F.col("p.value").alias("value"),
        F.col("p.props").alias("props"),
        "kafka_partition",
        "kafka_offset",
        # from_json permissive mode yields an all-NULL struct (not a
        # NULL struct) on corrupt input; event_id is wire-required, so
        # its absence is the corruption signal.
        (F.col("p").isNull() | F.col("p.event_id").isNull()).alias("is_corrupt"),
    )


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 5_000_000,
) -> DataFrame:
    """Streaming events from a Kafka topic (requires the
    spark-sql-kafka connector on the classpath; raises a clear error
    when it's absent — e.g. this sandbox)."""
    apply_runtime_confs(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        raw = reader.load()
    except Exception as exc:  # pragma: no cover - classpath-dependent
        raise RuntimeError(
            "Kafka source unavailable: the spark-sql-kafka-0-10 connector "
            "is not on the classpath (expected in this sandbox; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 on a real cluster)"
        ) from exc
    return parse_kafka_events(raw)

"""SparkSession construction + runtime configuration.

Two contexts use this module:

1. Our own tests / bench build a session via :func:`get_spark`.
2. The verification driver hands us *its* session; we can only apply
   runtime-settable confs there — :func:`apply_runtime_confs` holds
   exactly that subset and is called by every loader/query entry point
   (idempotent, cheap).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and necessary) to set on a session we do not own.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores timestamp[ns]; Spark 4 refuses TIMESTAMP(NANOS)
    # unless read as raw long (we convert to µs ourselves in catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics, matching DuckDB's naive timestamps.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas interchange (UDF paths, toPandas in tests).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Runtime re-planning: partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs; safe on a driver-owned session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A locked-down session may refuse some confs; every query is
            # written to degrade gracefully (only nanosAsLong is load-bearing,
            # and it is runtime-settable in Spark 4.1).
            pass
    return spark


def get_spark(
    app_name: str = "chrono-ts-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local session tuned for the test/bench scales.

    At cluster scale the same code runs unchanged: the confs below are
    either size-neutral (AQE, Arrow, timezone) or would be supplied by
    the cluster's spark-defaults (shuffle partitions sized to executors).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("CHRONO_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("CHRONO_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)

"""Retention + compaction over the date-partitioned at-rest layout."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from chrono_ts_spark.catalog import load_table
from chrono_ts_spark.operators.maintenance import (
    apply_retention,
    compact_partition,
    list_partitions,
)
from tests.conftest import SF_SMOKE


def _write_partitioned(spark, tmp_path) -> str:
    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).repartition(4).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(path)
    return path


def test_retention_drops_only_old_partitions(spark, tmp_path):
    path = _write_partitioned(spark, tmp_path)
    parts = list_partitions(path)
    assert len(parts) > 10
    cutoff = parts[5]
    dropped = apply_retention(path, cutoff)
    assert dropped == parts[:5]
    remaining = spark.read.parquet(path)
    # partition-type inference reads `day` back as DATE
    assert str(remaining.agg(F.min("day")).collect()[0][0]) == cutoff
    # row counts of surviving partitions untouched
    ev = load_table(spark, SF_SMOKE, "events")
    want = ev.filter(F.date_format("ts", "yyyy-MM-dd") >= cutoff).count()
    assert remaining.count() == want


def test_compaction_preserves_rows(spark, tmp_path):
    path = _write_partitioned(spark, tmp_path)
    day = list_partitions(path)[0]
    part_dir = Path(path) / f"day={day}"
    before_rows = spark.read.parquet(str(part_dir)).count()
    n_before = compact_partition(spark, path, day, target_files=1)
    assert n_before >= 2  # repartition(4) wrote multiple files
    assert len(list(part_dir.glob("*.parquet"))) == 1
    assert spark.read.parquet(str(part_dir)).count() == before_rows

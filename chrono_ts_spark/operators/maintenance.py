"""Storage-tier maintenance for time-partitioned tables (SURVEY §1.1
retention/downsample tier; docs/scale.md layout).

These operate on hive-style date-partitioned parquet directories (the
at-rest layout `io_partitioned_sink`/`ts_downsample_tier` write):

- apply_retention: drop partitions older than a cutoff — partition
  pruning makes this a metadata-only directory delete, never a scan.
- compact_partition: rewrite one partition's small files into
  ~target-size files (the streaming sink's micro-batch files fragment
  over time; compaction restores scan efficiency).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import SparkSession


def list_partitions(path: str, column: str = "day") -> list[str]:
    """Partition values present in a hive-layout directory."""
    prefix = f"{column}="
    return sorted(
        p.name[len(prefix):]
        for p in Path(path).iterdir()
        if p.is_dir() and p.name.startswith(prefix)
    )


def apply_retention(path: str, cutoff_value: str, column: str = "day") -> list[str]:
    """Delete partitions with value < cutoff (string/ISO-date order).

    Returns the dropped partition values. Directory-level delete: cost
    is O(dropped partitions), independent of data volume — the reason
    the at-rest layout partitions by date in the first place.
    """
    dropped = []
    for value in list_partitions(path, column):
        if value < cutoff_value:
            shutil.rmtree(Path(path) / f"{column}={value}")
            dropped.append(value)
    return dropped


def compact_partition(
    spark: SparkSession,
    path: str,
    value: str,
    column: str = "day",
    target_files: int = 1,
) -> int:
    """Rewrite one partition into `target_files` files; returns the
    file count before compaction. Reads only the one partition
    (partition pruning via the directory path)."""
    part_dir = Path(path) / f"{column}={value}"
    before = len(list(part_dir.glob("*.parquet")))
    df = spark.read.parquet(str(part_dir))
    # scratch dirs start with "_": Spark's partition discovery ignores
    # them (a "day=...-suffixed" name would surface as a bogus duplicate
    # partition to concurrent readers) and apply_retention's "day="
    # prefix filter can never expire the backup copy
    tmp = str(Path(path) / f"_compact_tmp_{column}_{value}")
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # swap: rename the live partition aside, then the compacted copy in.
    # A crash between the renames leaves the data intact in the backup
    # dir (never auto-deleted); readers see the partition missing only
    # for the instant between the two renames.
    old = str(Path(path) / f"_compact_old_{column}_{value}")
    Path(part_dir).rename(old)
    try:
        Path(tmp).rename(part_dir)
    except Exception:
        Path(old).rename(part_dir)  # roll back
        raise
    shutil.rmtree(old)
    return before

"""Storage-tier maintenance for time-partitioned tables (SURVEY §1.1
retention/downsample tier; docs/scale.md layout).

These operate on hive-style date-partitioned parquet directories (the
at-rest layout `io_partitioned_sink`/`ts_downsample_tier` write):

- apply_retention: drop partitions older than a cutoff — partition
  pruning makes this a metadata-only directory delete, never a scan.
- compact_partition: rewrite one partition's small files into
  ~target-size files (the streaming sink's micro-batch files fragment
  over time; compaction restores scan efficiency).

All filesystem access goes through the Hadoop FileSystem API
(``Path.getFileSystem`` resolves the scheme), so the same code runs
against file://, hdfs://, s3a://, abfs:// — a 100 TB table does not
live on the driver's local disk. Semantics note for object stores:
``rename`` is atomic on HDFS/local but copy+delete on S3A, so
compact_partition's swap window is not instantaneous there; for
S3-resident tables prefer compacting into a NEW partition value or a
table format (Iceberg/Delta) that commits via manifest. The swap is
still crash-safe everywhere: the pre-compaction data survives in the
backup dir until the new copy is fully in place.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for a URI via the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _child(spark: SparkSession, parent: str, name: str):
    return spark._jvm.org.apache.hadoop.fs.Path(parent, name)


def list_partitions(
    path: str, column: str = "day", spark: SparkSession | None = None
) -> list[str]:
    """Partition values present in a hive-layout directory."""
    spark = spark or SparkSession.active()
    fs, jpath = _fs_and_path(spark, path)
    prefix = f"{column}="
    return sorted(
        st.getPath().getName()[len(prefix):]
        for st in fs.listStatus(jpath)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    )


def apply_retention(
    path: str,
    cutoff_value: str,
    column: str = "day",
    spark: SparkSession | None = None,
) -> list[str]:
    """Delete partitions with value < cutoff (string/ISO-date order).

    Returns the dropped partition values. Directory-level delete: cost
    is O(dropped partitions), independent of data volume — the reason
    the at-rest layout partitions by date in the first place.
    """
    spark = spark or SparkSession.active()
    fs, _ = _fs_and_path(spark, path)
    dropped = []
    for value in list_partitions(path, column, spark):
        if value < cutoff_value:
            fs.delete(_child(spark, path, f"{column}={value}"), True)
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
    fs, _ = _fs_and_path(spark, path)
    part_dir = _child(spark, path, f"{column}={value}")
    before = sum(
        1
        for st in fs.listStatus(part_dir)
        if st.getPath().getName().endswith(".parquet")
    )
    df = spark.read.parquet(part_dir.toString())
    # scratch dirs start with "_": Spark's partition discovery ignores
    # them (a "day=...-suffixed" name would surface as a bogus duplicate
    # partition to concurrent readers) and apply_retention's "day="
    # prefix filter can never expire the backup copy
    tmp = _child(spark, path, f"_compact_tmp_{column}_{value}")
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp.toString())
    # swap: rename the live partition aside, then the compacted copy in.
    # A crash between the renames leaves the data intact in the backup
    # dir (never auto-deleted); readers see the partition missing only
    # for the swap window (instant on HDFS/local rename; copy-length on
    # S3A — see module docstring).
    old = _child(spark, path, f"_compact_old_{column}_{value}")
    if not fs.rename(part_dir, old):
        raise OSError(f"rename {part_dir} -> {old} failed")
    try:
        if not fs.rename(tmp, part_dir):
            raise OSError(f"rename {tmp} -> {part_dir} failed")
    except Exception:
        fs.rename(old, part_dir)  # roll back
        raise
    fs.delete(old, True)
    return before

#!/usr/bin/env python
"""Stream-stream join state-retention probe (r12, VERDICT r11 item 2).

The purchases-to-preceding-clicks join pair became the heaviest
streaming probe after the r11 stream_m4 fix (142.5 / 136.0 s at 30M).
It is linear, but HOW much state does the time-range condition
actually retain on each side, and does watermark tightness move it?

Theory (Spark's StreamingSymmetricHashJoinExec state watermarks, from
the join condition c_ts in (p_ts - lookback, p_ts] with watermark W):

- click side: a click can match future purchases until watermark
  passes c_ts + lookback  -> retained window ~ (W + lookback) of
  event time;
- purchase side: only past-or-equal clicks match, so a purchase is
  evictable once the watermark passes p_ts -> retained window ~ W.

BUT the registry/probe replay is SINGLE-FILE (one availableNow
micro-batch): the watermark is computed from the PREVIOUS batch, so
during the one-and-only data batch it is still 1970 and NOTHING can
be evicted mid-batch — both sides must buffer their full subset of
the corpus regardless of W. Watermark tightness is therefore a no-op
in single-file replay mode and only bites in multi-batch (production)
replay, where state should be bounded by the retained windows above.

This probe measures both modes with RocksDB state metrics harvested
from StreamingQueryProgress (numRowsTotal / stateMemory / SST sizes):

    python tools/ss_join_state_probe.py [rows] [users] [slices]
    # default 30_000_000 rows, rows//1000 users, 64 time slices
    python tools/ss_join_state_probe.py [rows] --only sliced_inner_1h,...
    # r13: variant-name filter (substring ok) — the 60M production-
    # posture run (VERDICT r12 item 5) needs only the sliced modes;
    # single-file at 60M is state-maximal by construction and adds
    # nothing beyond the measured 30M point.

Matrix: {single-file, time-sliced multi-batch} x {inner W=1h (the
registry setting), inner W=10min, left W=10min}. Inner output must be
identical across all variants (the match set is watermark-independent
when no row is late; the time-range slicing guarantees monotone
arrival). Internal evidence only — correctness runs on driver
fixtures.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def build_sliced_events(spark, src_file: str, out_dir: str, slices: int) -> None:
    """Re-lay the single-file corpus as `slices` time-range files,
    mtime-ordered so FileStreamSource (latestFirst=false) replays them
    oldest-first and the watermark advances monotonically."""
    df = spark.read.parquet(src_file).repartitionByRange(slices, "ts")
    staging = f"{out_dir}/_staging"
    df.sortWithinPartitions("ts").write.mode("overwrite").parquet(staging)
    parts = sorted(Path(staging).glob("part-*.parquet"))
    assert len(parts) == slices, f"expected {slices} parts, got {len(parts)}"
    # part file NAMES are already range-ordered (partition index order);
    # stamp increasing mtimes so the source's mod-time ordering agrees.
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    base = time.time() - slices * 2
    for i, p in enumerate(parts):
        dst = f"{out_dir}/slice_{i:05d}.parquet"
        shutil.move(str(p), dst)
        os.utime(dst, (base + i * 2, base + i * 2))
    shutil.rmtree(staging, ignore_errors=True)


def run_variant(
    spark,
    src_dir: str,
    glob: str,
    how: str,
    watermark: str,
    lookback_s: int = 600,
) -> dict:
    """_purchase_click_join body (streaming/stateful.py) with the
    source glob and watermark parameterized, run to a throwaway parquet
    sink, state metrics harvested from recentProgress."""
    from chrono_ts_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    schema = spark.read.parquet(src_dir).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )
    ev1 = raw.withWatermark("ts", watermark)
    ev2 = raw.withWatermark("ts", watermark)
    purchases = ev1.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    clicks = ev2.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {lookback_s} SECONDS"))
        & (F.col("c_ts") <= F.col("p_ts")),
        how,
    ).select("user_id", "p_id", "p_ts", "c_ts")

    sink = tempfile.mkdtemp(prefix="ssjoin_probe_sink_")
    ckpt = tempfile.mkdtemp(prefix="ssjoin_probe_ckpt_")
    t0 = time.time()
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    peak_rows = peak_mem = peak_sst = 0
    batches = 0
    for p in q.recentProgress:
        batches += 1
        for op in p.get("stateOperators", []):
            peak_rows = max(peak_rows, op.get("numRowsTotal", 0))
            peak_mem = max(peak_mem, op.get("stateMemory", 0) or op.get("memoryUsedBytes", 0))
            cm = op.get("customMetrics", {}) or {}
            peak_sst = max(peak_sst, cm.get("rocksdbSstFileSize", 0))
    q.stop()
    n_out = spark.read.parquet(sink).count()
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "sec": round(wall, 1),
        "rows_out": n_out,
        "batches": batches,
        "peak_state_rows": peak_rows,
        "peak_state_mem_mb": round(peak_mem / 2**20, 1),
        "peak_sst_mb": round(peak_sst / 2**20, 1),
    }


def main() -> int:
    only = None
    argv = sys.argv[1:]
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2 :]
    rows = int(argv[0]) if argv else 30_000_000
    users = int(argv[1]) if len(argv) > 1 else max(1000, rows // 1000)
    slices = int(argv[2]) if len(argv) > 2 else 64

    from chrono_ts_spark.session import get_spark
    from tools.stream_probe import build_single_file_events

    single = f"/tmp/probe_stream_{rows}"
    sliced = f"/tmp/probe_stream_sliced_{rows}_{slices}"
    spark = get_spark("ssjoin-state-probe")
    if not Path(f"{single}/events.parquet").is_file():
        t0 = time.time()
        build_single_file_events(spark, single, rows, users)
        print(f"  built {single} in {time.time() - t0:.1f}s", file=sys.stderr)
    if not list(Path(sliced).glob("slice_*.parquet")):
        t0 = time.time()
        build_sliced_events(spark, f"{single}/events.parquet", sliced, slices)
        print(f"  sliced into {sliced} in {time.time() - t0:.1f}s", file=sys.stderr)

    matrix = [
        ("single_inner_1h", single, "events.parquet", "inner", "1 hour"),
        ("single_inner_10m", single, "events.parquet", "inner", "10 minutes"),
        ("single_left_10m", single, "events.parquet", "leftOuter", "10 minutes"),
        ("sliced_inner_1h", sliced, "slice_*.parquet", "inner", "1 hour"),
        ("sliced_inner_10m", sliced, "slice_*.parquet", "inner", "10 minutes"),
        ("sliced_left_10m", sliced, "slice_*.parquet", "leftOuter", "10 minutes"),
    ]
    if only is not None:
        matrix = [
            row for row in matrix if any(pat in row[0] for pat in only)
        ]
    results = {}
    for name, src, glob, how, wm in matrix:
        try:
            results[name] = run_variant(spark, src, glob, how, wm)
        except Exception as e:  # noqa: BLE001 — probe records and moves on
            results[name] = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        print(f"  {name}: {results[name]}", file=sys.stderr)
    print(json.dumps({"rows": rows, "users": users, "slices": slices,
                      "queries": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

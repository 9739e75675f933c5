#!/usr/bin/env python
"""Streaming-family scale probe (promoted to a tool in r11, the
driver_sim precedent: the r9 10M / r10 30M / r11 30M streaming probes
were ad-hoc scripts, and the streaming frontier has produced the two
biggest scale finds of the project — the HDFSBackedStateStore heap
OOM and the data-proportional memory-sink OOM — so the harness that
found them should be re-runnable verbatim every round).

Builds a SINGLE-FILE events corpus (the single-micro-batch replay
premise that the upsert/alert oracles require — replay.py's
assert_single_file_replay) and runs the full streaming family against
it, memory sinks for bounded-output streams and parquet sinks for the
data-proportional ones (the r11 rule: EMA/Holt/Kalman/sessions/enrich
emit O(input) rows and must never cross a collecting sink at probe
scale).

    python tools/stream_probe.py [rows] [users]
    # default 60_000_000 rows, rows//1000 users (the ts-probe series
    # convention: constant 1000 events/series as rows scale)

Internal evidence only — correctness always runs on driver fixtures.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_single_file_events(spark, path: str, rows: int, users: int) -> None:
    """scale_probe.build, then compact to ONE regular parquet file at
    <path>/events.parquet (Spark writes directories; the replay
    premise needs a file, so the lone part file is moved into place).
    A single parquet file still scans in parallel — the batch behind
    the one trigger splits by row group."""
    from tools.scale_probe import build

    staging = f"{path}/_staging"
    build(spark, staging, rows, users)
    compact_dir = f"{path}/_compact"
    spark.read.parquet(f"{staging}/events.parquet").coalesce(1).write.mode(
        "overwrite"
    ).parquet(compact_dir)
    parts = [p for p in Path(compact_dir).glob("part-*.parquet")]
    assert len(parts) == 1, f"expected one part file, got {parts}"
    Path(path).mkdir(parents=True, exist_ok=True)
    shutil.move(str(parts[0]), f"{path}/events.parquet")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(compact_dir, ignore_errors=True)


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
    users = int(sys.argv[2]) if len(sys.argv) > 2 else max(1000, rows // 1000)

    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark

    path = f"/tmp/probe_stream_{rows}"
    spark = get_spark("stream-probe")
    if not Path(f"{path}/events.parquet").is_file():
        t0 = time.time()
        build_single_file_events(spark, path, rows, users)
        print(f"  built {path} in {time.time() - t0:.1f}s", file=sys.stderr)

    from chrono_ts_spark.streaming.replay import (
        run_m4_stream,
        run_sessionized_stream,
        run_stateful_dedup_stream,
        run_stream_static_enrich,
        run_tumbling_counts_stream,
    )
    from chrono_ts_spark.streaming.stateful import (
        run_cusum_stream,
        run_ema_stream,
        run_holt_stream,
        run_kalman_stream,
        run_running_extrema_stream,
        run_sliding_counts_stream,
        run_stream_stream_join,
        run_stream_stream_join_left,
    )

    reg = load_all()

    def sink(fn):
        """Wrap a sink_dir runner: fresh parquet sink, removed after count."""

        def go(spark, sf):
            d = tempfile.mkdtemp(prefix="chrono_stream_probe_sink_")
            try:
                return fn(spark, sf, sink_dir=d).count()
            finally:
                shutil.rmtree(d, ignore_errors=True)

        return go

    probes: list[tuple[str, object]] = [
        # bounded-output streams -> memory sink (the registry shape)
        ("bucket_counts", lambda s, sf: run_tumbling_counts_stream(s, sf).count()),
        ("m4", lambda s, sf: run_m4_stream(s, sf).count()),
        ("dedup_counts", lambda s, sf: run_stateful_dedup_stream(s, sf).count()),
        ("sliding", lambda s, sf: run_sliding_counts_stream(s, sf).count()),
        ("running_extrema", lambda s, sf: run_running_extrema_stream(s, sf).count()),
        # the serving tier + the pipeline on top of it
        ("upsert_merge", lambda s, sf: reg["stream_upsert_counts"].fn(s, sf).count()),
        ("alert_burst", lambda s, sf: reg["stream_alert_burst"].fn(s, sf).count()),
        # two-sided state
        ("ss_join", lambda s, sf: run_stream_stream_join(s, sf).count()),
        ("ss_join_left", lambda s, sf: run_stream_stream_join_left(s, sf).count()),
        # data-proportional output -> production parquet sink
        ("sessions_parquet", sink(run_sessionized_stream)),
        ("enrich_parquet", sink(run_stream_static_enrich)),
        ("ema_parquet", sink(run_ema_stream)),
        ("holt_parquet", sink(run_holt_stream)),
        ("kalman_parquet", sink(run_kalman_stream)),
        # one row per input event (found by this harness's smoke run)
        ("cusum_parquet", sink(run_cusum_stream)),
    ]

    def restart():
        nonlocal spark
        try:
            spark.stop()
        except Exception:
            pass
        spark = get_spark("stream-probe")

    results: dict[str, object] = {}
    for i, (name, fn) in enumerate(probes):
        if i and i % 5 == 0:
            restart()  # heavy stateful streams: bound heap/RocksDB carryover
        t0 = time.time()
        try:
            n = fn(spark, path)
            results[name] = {"sec": round(time.time() - t0, 1), "rows": n}
            print(f"  {name}: {results[name]}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — probe harness records and moves on
            results[name] = f"ERROR {type(e).__name__}: {str(e)[:300]}"
            print(f"  {name}: {results[name]}", file=sys.stderr)
            restart()
    print(json.dumps({"rows": rows, "users": users, "queries": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

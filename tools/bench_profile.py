#!/usr/bin/env python
"""Per-query profile of the bench set: DataFrame build time, first
noop-sink run (codegen/planning cold) and best-of-N warm runs, plus a
trivial-action floor so fixed job overhead is visible.

Usage: python tools/bench_profile.py [names...]   (default: bench tags)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from chrono_ts_spark.queries import load_all  # noqa: E402
from chrono_ts_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    names = sys.argv[1:] or sorted(
        n for n, spec in registry.items() if "bench" in spec.tags
    )
    spark = get_spark("bench-profile")
    # Warm the session like bench.py does.
    try:
        registry["ts_topk_users"].fn(spark, sf_dir).count()
    except Exception as e:
        print(f"warm-up failed: {e}", file=sys.stderr)

    # Trivial-action floor: noop write of a 1-row in-memory frame.
    floor = []
    for _ in range(5):
        t0 = time.time()
        noop(spark.range(1))
        floor.append(time.time() - t0)
    out = {"floor_sec": round(min(floor), 3)}

    rows = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = registry[name].fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        noop(df)
        t_first = time.time() - t0
        warm = []
        for _ in range(3):
            # Rebuild the frame each time, as bench.py does.
            t0 = time.time()
            noop(registry[name].fn(spark, sf_dir))
            warm.append(time.time() - t0)
        rows[name] = {
            "build": round(t_build, 3),
            "first": round(t_first, 3),
            "warm_best": round(min(warm), 3),
            "warm_all": [round(w, 3) for w in warm],
        }
        print(
            f"  {name}: build={t_build:.2f} first={t_first:.2f} "
            f"warm={min(warm):.2f}",
            file=sys.stderr,
        )
    out["queries"] = rows
    out["total_warm_best"] = round(sum(r["warm_best"] for r in rows.values()), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ts_theil_sen_windowed watch resolution probe (r12, VERDICT r11
item 3): at the next events doubling (240M rows, constant 1000
pts/series), record the 16g completion trend for the windowed exact
path alongside the sampled swap — or its OOM, which demotes windowed
to the bounded-series contract and makes ts_theil_sen_sampled the
documented default for unbounded series.

    CHRONO_DRIVER_MEM=16g python tools/theil_sen_probe.py [rows]
    # default 240_000_000; users = rows // 1000 (the ts-probe series
    # convention). Reuses /tmp/chrono_scale_v2_<rows> if present.

Internal evidence only — correctness always runs on driver fixtures.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000_000
    users = max(1000, rows // 1000)

    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark
    from tools.scale_probe import build

    spark = get_spark("theil-sen-probe")
    path = f"/tmp/chrono_scale_v2_{rows}"
    if not Path(f"{path}/events.parquet").exists():
        t0 = time.time()
        build(spark, path, rows, users)
        print(f"  built {path} in {time.time() - t0:.1f}s", file=sys.stderr)
    reg = load_all()

    results: dict[str, object] = {}
    for name in ("ts_theil_sen_sampled", "ts_theil_sen_windowed"):
        t0 = time.time()
        try:
            reg[name].fn(spark, path).write.mode("overwrite").format("noop").save()
            results[name] = {"sec": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — the OOM IS the datum
            results[name] = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        print(f"  {name}: {results[name]}", file=sys.stderr)
    mem = spark.conf.get("spark.driver.memory")
    print(json.dumps({"rows": rows, "users": users, "driver_mem": mem,
                      "queries": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

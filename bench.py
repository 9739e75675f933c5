#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced through the noop sink (full computation, no
driver-side collect), timed per query after one warm-up of the session
(JVM/codegen warm, fixture footers cached).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from chrono_ts_spark.queries import load_all  # noqa: E402
from chrono_ts_spark.session import get_spark  # noqa: E402


def run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    # (stream_* queries run their streaming job internally and return a
    # batch memory table, so the noop sink covers every registry query)
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def build_artifact(
    timings: dict[str, float], errors: dict[str, str], sf: float, spark_version: str
) -> dict:
    """Assemble the one-line JSON artifact. A partial sum under the
    headline metric name would read as "faster" across rounds (ADVICE
    r5/r6): the headline `value` is null and `partial` true whenever
    any query errored — per-query detail still carries the numbers.
    Unit-tested in tests/test_bench_artifact.py."""
    total = round(sum(timings.values()), 3) if not errors else None
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "spark": spark_version,
    }
    if errors:
        out["errors"] = errors
        out["partial"] = True
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    names = sorted(n for n, spec in registry.items() if "bench" in spec.tags)

    spark = get_spark("chrono-bench")
    # Warm-up: one cheap action so JVM startup isn't billed to query 1.
    # (Isolated like the per-query runs — a raising warm-up must not
    # null the whole artifact, which happened in rounds 3-4.)
    try:
        registry["ts_topk_users"].fn(spark, sf_dir).count()
    except Exception as e:  # pragma: no cover - defensive
        print(f"  warm-up failed: {e}", file=sys.stderr)
    # r15 measurement fix (same rationale as the JVM warm-up above,
    # documented in OPTIMIZATION_r15.md): one trivial pandas-UDF action
    # so the Python worker pool (fork + numpy/pandas import, ~3-6 s on
    # local[32]) isn't billed to the alphabetically-first Python-UDF
    # query (doc_minhash_near_dups read 6.6 s in-bench vs 2.4 s solo
    # from exactly this). Workers are session infrastructure, not query
    # work; every query still computes from the parquet inputs.
    try:
        import pandas as _pd
        from pyspark.sql.functions import col as _col, pandas_udf as _pudf

        @_pudf("long")
        def _warm(s: _pd.Series) -> _pd.Series:
            return s

        cpus = spark.sparkContext.defaultParallelism
        (
            spark.range(0, cpus, 1, cpus)
            .select(_warm(_col("id")))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
    except Exception as e:  # pragma: no cover - defensive
        print(f"  python warm-up failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            best = min(run_once(registry[name].fn, spark, sf_dir) for _ in range(2))
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"  {name}: ERROR {type(e).__name__}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.2f}s", file=sys.stderr)

    out = build_artifact(timings, errors, float(sf), spark.version)
    # Solo re-run of the most expensive headline query (VERDICT r5 #8):
    # in-bench doc_minhash_near_dups carries ±1 s of session/GC noise, so
    # a clean solo number rides along for round-over-round comparison.
    try:
        out["solo_minhash_sec"] = round(
            run_once(registry["doc_minhash_near_dups"].fn, spark, sf_dir), 3
        )
    except Exception as e:  # pragma: no cover - defensive
        out["solo_minhash_sec"] = None
        print(f"  solo minhash failed: {e}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

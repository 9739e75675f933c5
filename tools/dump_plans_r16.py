#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r16/<q>_<tag>.txt.

Usage: python tools/dump_plans_r16.py <tag> <query> [<query> ...]
Internal evidence tool for the r16 optimization round (judge checks
plan claims against these files).
"""
from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump-plans-r16")
    reg = load_all()
    sf = "/root/testdata/sf0.1"
    outdir = Path(__file__).resolve().parents[1] / "plans" / "r16"
    outdir.mkdir(parents=True, exist_ok=True)
    for n in names:
        df = reg[n].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{n}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {n}_{tag}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

"""CLI: run registry queries / bench / plan audit from the shell.

    python -m chrono_ts_spark list
    python -m chrono_ts_spark run ts_bucket_agg [--sf DIR] [-n 20]
    python -m chrono_ts_spark explain ts_asof_join [--sf DIR]
"""

from __future__ import annotations

import argparse


def main() -> int:
    ap = argparse.ArgumentParser(prog="chrono_ts_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("--tag", default=None)

    p_run = sub.add_parser("run", help="run a query and show results")
    p_run.add_argument("name")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("-n", type=int, default=20, help="rows to show")

    p_exp = sub.add_parser("explain", help="show a query's physical plan")
    p_exp.add_argument("name")
    p_exp.add_argument("--sf", default="/root/testdata/sf0.01")

    args = ap.parse_args()

    from .queries import load_all

    registry = load_all()

    if args.cmd == "list":
        for name, spec in sorted(registry.items()):
            if args.tag and args.tag not in spec.tags:
                continue
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} {kind:9s} {','.join(spec.tags)}")
        return 0

    from .session import get_spark

    spark = get_spark("chrono-cli")
    df = registry[args.name].fn(spark, args.sf)
    if args.cmd == "run":
        df.show(args.n, truncate=False)
    else:
        df.explain("formatted")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

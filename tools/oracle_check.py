#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query with Spark AND its DuckDB oracle SQL on the
same parquet, then compares row count, column names (sorted), dtypes,
and exact values (rows sorted by all columns). Stricter than the
driver's order-insensitive value-hash, so local green ⇒ driver green
(the fixture data is fixed, not random).

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, values python-native."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    return df


def row_key(row):
    out = []
    for v in row:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append((0, ""))
        else:
            out.append((1, str(v)))
    return out


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    # The driver's canonicalizer cannot sort/hash array/map/struct
    # cells (r6 doc_inverted_index crash): an oracled query returning
    # one must FAIL here even though normalize() below could tuple-ize
    # it — "local green => driver green" must stay true.
    import numpy as np

    for c in spark_pdf.columns:
        col = spark_pdf[c]
        if col.dtype == object and col.map(
            lambda v: isinstance(v, (list, tuple, dict, np.ndarray))
        ).any():
            problems.append(
                f"column '{c}' holds complex values the driver canonicalizer "
                "cannot hash — serialize it (array_join/to_json) on both sides"
            )
            return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems

    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    s_dt, d_dt = [str(t) for t in s.dtypes], [str(t) for t in d.dtypes]
    if s_dt != d_dt:
        problems.append(f"dtypes spark={dict(zip(s_cols, s_dt))} duck={dict(zip(d_cols, d_dt))}")

    if problems and any(p.startswith("rowcount") for p in problems):
        return problems

    s_rows = sorted([tuple(r) for r in s.itertuples(index=False)], key=row_key)
    d_rows = sorted([tuple(r) for r in d.itertuples(index=False)], key=row_key)
    n_bad = 0
    first = None
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        same = True
        for x, y in zip(a, b):
            if x is None and y is None:
                continue
            xf = isinstance(x, float)
            yf = isinstance(y, float)
            if xf and yf and math.isnan(x) and math.isnan(y):
                continue
            if (x is None) != (y is None):
                same = False
                break
            if x != y:
                same = False
                break
        if not same:
            n_bad += 1
            if first is None:
                first = (i, a, b)
    if n_bad:
        problems.append(f"{n_bad}/{len(s_rows)} rows differ; first diff #{first[0]}:\n  spark={first[1]}\n  duck ={first[2]}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tag", default=None, help="only queries with this tag")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark

    registry = load_all()
    names = args.names or [
        n
        for n, spec in registry.items()
        if args.tag is None or args.tag in spec.tags
    ]

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    from chrono_ts_spark.catalog import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        spec = registry[name]
        t0 = time.time()
        try:
            rdf = spec.fn(spark, args.sf)
            if spec.out_schema is not None:
                # the static contract lint trusts this declaration
                # instead of building the plan — drift dies here, on
                # every sweep, before it can reach the lint or driver
                from pyspark.sql.types import StructType

                declared = StructType.fromDDL(spec.out_schema)
                as_pairs = lambda st: [(f.name, f.dataType) for f in st.fields]  # noqa: E731
                if as_pairs(declared) != as_pairs(rdf.schema):
                    print(
                        f"FAIL {name}: out_schema declaration drifted: "
                        f"declared <{declared.simpleString()}> actual "
                        f"<{rdf.schema.simpleString()}>"
                    )
                    failures += 1
                    continue
            sdf = rdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            ddf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

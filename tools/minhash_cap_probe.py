#!/usr/bin/env python
"""Capped-MinHash scale validation (r12, follow-on to VERDICT r11
item 4): the r12 changes to the max_shingle_df path — persist the
shingle/hash table across the df pass and the signature pass, ship
the drop set as a sorted int64 numpy array — must keep the r11
invariants at probe scale (identical duplicates found, linear
candidates) and should REDUCE the df-pass overhead (the r11 reading
paid the text pipeline twice: +37-85 s at 2M/4M docs).

    python tools/minhash_cap_probe.py [docs] [cap]
    # default 2_000_000 docs, cap = recommended_shingle_df_cap(docs)

Prints candidate counts, verified-dup counts (exact jaccard >= 0.5),
and walls for uncapped vs capped. Internal evidence only.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from chrono_ts_spark.operators.dedup import (
        exact_jaccard_pairs,
        minhash_lsh_candidates,
        recommended_shingle_df_cap,
    )
    from chrono_ts_spark.session import get_spark
    from tools.scale_probe import build_documents

    cap = int(sys.argv[2]) if len(sys.argv) > 2 else recommended_shingle_df_cap(docs)
    spark = get_spark("minhash-cap-probe")
    path = f"/tmp/chrono_scale_v2_docs_{docs}"
    if not Path(f"{path}/documents.parquet").exists():
        t0 = time.time()
        build_documents(spark, path, docs)
        print(f"  built {path} in {time.time() - t0:.1f}s", file=sys.stderr)
    d = spark.read.parquet(f"{path}/documents.parquet")

    results = {}
    for name, max_df in (("uncapped", None), (f"capped_{cap}", cap)):
        t0 = time.time()
        cands = minhash_lsh_candidates(
            d, "doc_id", "text", 64, 16, 5,
            size_hint=docs, max_shingle_df=max_df,
        )
        n_cand = cands.count()
        t_cand = time.time() - t0
        t0 = time.time()
        dups = (
            exact_jaccard_pairs(d, cands, "doc_id", "text", 5)
            .filter(F.col("jaccard") >= 0.5)
            .count()
        )
        results[name] = {
            "candidates": n_cand,
            "dups": dups,
            "cand_sec": round(t_cand, 1),
            "verify_sec": round(time.time() - t0, 1),
        }
        print(f"  {name}: {results[name]}", file=sys.stderr)
        spark.catalog.clearCache()  # capped path persists hs
    print(json.dumps({"docs": docs, "cap": cap, "queries": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Dump the probe-scale (16M vectors) emb_pq_topk rerank plan.

At fixture scale (sf0.1) the planner's size estimates are tiny and the
rerank join broadcasts either way — plans/r16/emb_pq_topk_{before,after}.txt
are identical there. The r16 broadcast fix matters at probe scale, where
the static plan picked a SortMergeJoin that shuffled the full raw-vector
corpus; this script dumps the 16M plan for whatever pq.py is currently
checked out (run once on the r15 form via `git stash`, once on HEAD).

Usage: python tools/dump_pq_plan_16m.py <out_file>
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from chrono_ts_spark.catalog import load_table  # noqa: E402
from chrono_ts_spark.operators.pq import pq_adc_topk, pq_fit  # noqa: E402
from chrono_ts_spark.session import ensure_package_on_workers, get_spark  # noqa: E402


def main() -> int:
    out = sys.argv[1]
    path = "/tmp/chrono_scale_v2_emb_16000000"
    spark = get_spark(app_name="dump_pq_plan_16m")
    ensure_package_on_workers(spark)
    e = load_table(spark, path, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    codebook = pq_fit(e, 64, m_sub=8, k=16, iters=2)
    df = pq_adc_topk(e, probes, codebook, k=5, rerank=50)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(out, "w") as f:
        f.write(plan)
    print(f"wrote {out} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

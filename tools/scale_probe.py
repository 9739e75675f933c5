#!/usr/bin/env python
"""Scale probe: run the TSDB operator suite on a synthetic events table
10-100x larger than the sf0.1 fixture, to measure how the plan shapes
scale (docs/scale.md). Internal evidence only — correctness queries
always run on the driver-provided fixtures.

    python tools/scale_probe.py [rows] [users]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, path: str, rows: int, users: int) -> None:
    month_us = 30 * 86400 * 1_000_000
    df = (
        spark.range(rows)
        .withColumn("event_id", F.col("id"))
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(1704067200000000)
                + F.pmod(F.xxhash64(F.col("id")), F.lit(month_us))
            ),
        )
        .withColumn("user_id", F.pmod(F.xxhash64(F.col("id") + 7), F.lit(users)))
        .withColumn(
            "event_type",
            F.element_at(
                F.array(*[F.lit(t) for t in ["click", "view", "purchase", "error", "signup"]]),
                (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(5)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "value",
            F.round(
                F.pmod(F.xxhash64(F.col("id") + 29), F.lit(30000)).cast("double")
                / 100.0,
                2,
            ),
        )
        .withColumn("props", F.concat(F.lit('{"k": '), (F.col("id") % 100).cast("string"), F.lit("}")))
        .drop("id")
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def build_documents(spark, path: str, docs: int, vocab_size: int = 100) -> None:
    """Synthetic word-soup documents (~50 words from a 100-word vocab)
    for the text-pipeline probes.

    ``vocab_size`` (late r11): the fixed 100-word vocabulary makes
    random shingle collisions Θ(n²) — at 2M docs the LSH candidate set
    is dominated by that corpus artifact, not the planted clones (the
    wave-2 finding). Real corpora grow vocabulary with size (Heaps'
    law), keeping collision rates roughly flat; passing a scaled
    vocab_size (e.g. docs // 10_000) builds a corpus that measures the
    ENGINE's scaling instead of the artifact. The default stays 100 so
    the chrono_scale_v2 baselines remain comparable across rounds.

    r9: the corpus now contains REAL repeated content, because a
    word-soup of unique docs gives the span/dedup family nothing to
    find (a probe that exercises only the explode+groupBy half of the
    plan hides the candidate-join and island-merge cost — the
    windowed-theil lesson applied to text):
    - every doc_id % 50 == 49 is an EXACT clone of doc_id - 1
      (adjacent duplicate pairs, ~2% of the corpus);
    - every doc_id % 20 == 0 embeds a fixed 14-token boilerplate
      passage (a hot repeated span shared by ~5% of the corpus — the
      skewed-hash case a real boilerplate footer produces);
    - every doc_id % 7 == 3 embeds a second, different boilerplate.
    """
    seed = F.when(
        F.col("id") % 50 == 49, F.col("id") - 1
    ).otherwise(F.col("id"))
    boiler_a = " ".join(f"ba{i}" for i in range(14))
    boiler_b = " ".join(f"bb{i}" for i in range(14))
    soup = F.concat_ws(
        " ",
        F.transform(
            F.sequence(
                F.lit(1),
                (F.pmod(F.xxhash64(seed), F.lit(40)) + 30).cast("int"),
            ),
            # direct word synthesis (w0..w{v-1}) instead of element_at
            # over a literal array, so vocab_size scales to any value
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(seed, i), F.lit(vocab_size)).cast("string"),
            ),
        ),
    )
    df = (
        spark.range(docs)
        .withColumn("doc_id", F.col("id"))
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                soup,
                F.when(seed % 20 == 0, F.lit(boiler_a)).otherwise(F.lit("")),
                F.when(seed % 7 == 3, F.lit(boiler_b)).otherwise(F.lit("")),
            ),
        )
        .withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in ["en", "zh", "es", "fr", "de"]]),
                (F.pmod(F.xxhash64(F.col("id") + 3), F.lit(5)) + 1).cast("int"),
            ),
        )
        .withColumn("source", F.concat(F.lit("src"), (F.col("id") % 20).cast("string")))
        .withColumn("n_chars", F.length("text"))
        .drop("id")
    )
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")


def build_embeddings(spark, path: str, vecs: int, dims: int = 64) -> None:
    """Synthetic embeddings: 8 well-separated hash-jittered clusters."""
    df = (
        spark.range(vecs)
        .withColumn("vec_id", F.col("id"))
        .withColumn("label", (F.col("id") % 8).cast("int"))
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda d: (
                    F.when(d == (F.col("id") % 8).cast("int") * 8, F.lit(10.0)).otherwise(0.0)
                    + F.pmod(F.xxhash64(F.col("id"), d), F.lit(1000)).cast("double")
                    / 1000.0
                ).cast("float"),
            ),
        )
        .drop("id")
    )
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def build_tpch(spark, path: str, mult: int = 50, fixture: str = "/root/testdata/sf0.1") -> None:
    """Synthetic TPC-H-ish tables at `mult`x the sf0.1 fixture sizes
    (lineitem 600k -> 30M at mult=50), schema- and value-range-
    compatible with the fixtures (dates 1995+, FK keys modular within
    the parent key space) so the relational registry queries run
    unmodified. region/nation copy from the fixture (they are
    dimension constants)."""
    h = F.xxhash64

    def pm(col, n):
        return F.pmod(h(col), F.lit(n))

    for t in ("region", "nation"):
        spark.read.parquet(f"{fixture}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{path}/{t}.parquet")
    n_cust, n_supp, n_part = 15_000 * mult, 1_000 * mult, 20_000 * mult
    n_ord, n_li = 150_000 * mult, 600_000 * mult
    day_us = 86_400_000_000
    t0 = 788_918_400_000_000  # 1995-01-01 UTC in micros
    seg = F.array(*[F.lit(s) for s in
                    ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]])
    (
        spark.range(n_cust)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.col("id").cast("string")).alias("c_name"),
            pm(F.col("id") + 1, 25).cast("int").alias("c_nationkey"),
            (pm(F.col("id") + 2, 1_100_000).cast("double") / 100.0 - 1000.0).alias("c_acctbal"),
            F.element_at(seg, (pm(F.col("id") + 3, 5) + 1).cast("int")).alias("c_mktsegment"),
        )
        .write.mode("overwrite").parquet(f"{path}/customer.parquet")
    )
    (
        spark.range(n_supp)
        .select(
            F.col("id").alias("s_suppkey"),
            F.concat(F.lit("Supplier#"), F.col("id").cast("string")).alias("s_name"),
            pm(F.col("id") + 4, 25).cast("int").alias("s_nationkey"),
            (pm(F.col("id") + 5, 1_100_000).cast("double") / 100.0 - 1000.0).alias("s_acctbal"),
        )
        .write.mode("overwrite").parquet(f"{path}/supplier.parquet")
    )
    brands = F.array(*[F.lit(f"Brand#{i}{j}") for i in range(1, 6) for j in range(1, 6)])
    types = F.array(*[F.lit(f"{a} {b} {c}")
                      for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
                      for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
                      for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")])
    words = F.array(*[F.lit(w) for w in
                      ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
                       "black", "blanched", "blue", "blush", "brown", "burlywood"]])
    (
        spark.range(n_part)
        .select(
            F.col("id").alias("p_partkey"),
            F.concat_ws(" ",
                        F.element_at(words, (pm(F.col("id") + 6, 12) + 1).cast("int")),
                        F.element_at(words, (pm(F.col("id") + 7, 12) + 1).cast("int"))).alias("p_name"),
            F.element_at(brands, (pm(F.col("id") + 8, 25) + 1).cast("int")).alias("p_brand"),
            F.element_at(types, (pm(F.col("id") + 9, 150) + 1).cast("int")).alias("p_type"),
            (pm(F.col("id") + 10, 50) + 1).cast("int").alias("p_size"),
            (F.lit(900.0) + pm(F.col("id") + 11, 110_000).cast("double") / 100.0).alias("p_retailprice"),
        )
        .write.mode("overwrite").parquet(f"{path}/part.parquet")
    )
    status = F.array(F.lit("O"), F.lit("F"), F.lit("P"))
    prio = F.array(*[F.lit(p) for p in
                     ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]])
    (
        spark.range(n_ord)
        .select(
            F.col("id").alias("o_orderkey"),
            pm(F.col("id") + 12, n_cust).alias("o_custkey"),
            F.element_at(status, (pm(F.col("id") + 13, 3) + 1).cast("int")).alias("o_orderstatus"),
            (F.lit(1000.0) + pm(F.col("id") + 14, 45_000_000).cast("double") / 100.0).alias("o_totalprice"),
            F.timestamp_micros(F.lit(t0) + pm(F.col("id") + 15, 2_400) * F.lit(day_us)).alias("o_orderdate"),
            F.element_at(prio, (pm(F.col("id") + 16, 5) + 1).cast("int")).alias("o_orderpriority"),
        )
        .write.mode("overwrite").parquet(f"{path}/orders.parquet")
    )
    rflag = F.array(F.lit("R"), F.lit("A"), F.lit("N"))
    lstat = F.array(F.lit("O"), F.lit("F"))
    (
        spark.range(n_li)
        .select(
            pm(F.col("id") + 17, n_ord).alias("l_orderkey"),
            pm(F.col("id") + 18, n_part).alias("l_partkey"),
            pm(F.col("id") + 19, n_supp).alias("l_suppkey"),
            (pm(F.col("id") + 20, 7) + 1).cast("int").alias("l_linenumber"),
            (pm(F.col("id") + 21, 50) + 1).cast("double").alias("l_quantity"),
            (F.lit(900.0) + pm(F.col("id") + 22, 9_500_000).cast("double") / 100.0).alias("l_extendedprice"),
            (pm(F.col("id") + 23, 11).cast("double") / 100.0).alias("l_discount"),
            (pm(F.col("id") + 24, 9).cast("double") / 100.0).alias("l_tax"),
            F.element_at(rflag, (pm(F.col("id") + 25, 3) + 1).cast("int")).alias("l_returnflag"),
            F.element_at(lstat, (pm(F.col("id") + 26, 2) + 1).cast("int")).alias("l_linestatus"),
            F.timestamp_micros(F.lit(t0) + pm(F.col("id") + 27, 2_500) * F.lit(day_us)).alias("l_shipdate"),
        )
        .write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    )


_TPCH_PROBE = [
    "rel_pricing_summary",
    "rel_nation_revenue",
    "rel_market_share",
    "rel_top_supplier_revenue",
    "rel_bloom_join_revenue",
    "rel_returned_revenue_customers",
    "rel_top_revenue_orders",
    "rel_rfm_segments",
    "rel_abc_xyz",
    "rel_ols_coefficients",
    "rel_price_percentiles",
    "rel_median_mode",
    "rel_weighted_median",
    "rel_acctbal_distribution",
    "rel_cube_sales",
    "rel_market_basket",
    # r10: the round-10 window's relational members that had never run
    # beyond sf0.1 (probe-gate discipline: find scale hazards BEFORE
    # the driver window runs them), plus the r10 quantile swap.
    "rel_price_percentiles_ranged",
    "rel_triangle_parts",
    "rel_stratified_sample",
    "rel_unpivot_metric_stats",
    "rel_division_all_priorities",
    "rel_skyline_orders",
    "rel_topk_with_ties",
    "rel_cohort_ltv",
    "rel_abc_analysis",
    "rel_cdc_compact",
    "rel_calendar_coverage",
    "rel_growth_rates",
    "rel_benford_law",
    "rel_nullsafe_join",
    "rel_moving_annual_total",
    "rel_clamped_balance",
    "rel_not_in_null_trap",
    "rel_ratio_to_report",
    "rel_mix_shift_chi2",
    "rel_segment_migration",
    "rel_ship_latency",
    "rel_hhi_concentration",
    "rel_discount_elasticity",
    "rel_price_volume_mix",
    "rel_basket_size_histogram",
    "rel_loo_target_encoding",
    "rel_duplicate_payments",
    "rel_new_vs_returning",
    "rel_numeric_correlations",
]


def main_tpch() -> None:
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    # optional comma-list of names (r14): solo re-probes of single
    # queries at a new multiplier shouldn't pay for the full list
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else _TPCH_PROBE

    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark

    spark = get_spark("scale-probe-tpch")
    reg = load_all()
    path = f"/tmp/chrono_tpch_{mult}x"
    if not Path(f"{path}/lineitem.parquet").exists():
        build_tpch(spark, path, mult)
    timings = {}
    for i, n in enumerate(names):
        # same restart-every-15 GCLocker guard as main() (r9 rule)
        if i and i % 15 == 0:
            spark.stop()
            spark = get_spark("scale-probe-tpch")
            reg = load_all()
        t0 = time.time()
        reg[n].fn(spark, path).write.mode("overwrite").format("noop").save()
        timings[n] = round(time.time() - t0, 2)
        print(f"  {n}: {timings[n]}s", file=sys.stderr)
    print(json.dumps({"mult": mult, "queries": timings}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--tpch":
        return main_tpch()
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    users = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark

    spark = get_spark("scale-probe")
    reg = load_all()
    # v2: documents now carry planted duplicate passages/clones (r9) —
    # versioned dir so a stale pre-r9 corpus can't serve silently
    path = f"/tmp/chrono_scale_v2_{rows}"
    if not Path(f"{path}/events.parquet").exists():
        build(spark, path, rows, users)
    n_docs = max(10_000, rows // 50)
    if not Path(f"{path}/documents.parquet").exists():
        build_documents(spark, path, n_docs)

    names = [
        "ts_bucket_agg",
        "ts_ohlc_daily",
        "ts_rate",
        "ts_sessionize",
        "ts_topk_users",
        "ts_asof_join",
        "ts_range_join_counts",
        "ts_gapfill_locf",
        "ts_cumsum",
        "ts_salted_agg",
        # round-2 additions
        "ts_scd2_user_state",
        "ts_cusum_alarms",
        "ts_zorder_values",
        # round-5 additions
        "ts_series_corr",
        "ts_burst_detect",
        "ts_ema",
        "ts_time_weighted_avg",
        # round-6 additions
        "ts_m4_downsample",
        "ts_seasonal_baseline",
        "ts_holt_linear",
        # late round-6 additions
        "ts_rolling_actives",
        "ts_rolling_actives_approx",
        "ts_sax_symbols",
        "ts_dtw_pairs",
        "ts_gorilla_size_estimate",
        "ts_xcorr_best_lag",
        "ts_ks_drift",
        "ts_weekly_profile",
        "ts_pelt_segments",
        "ts_holt_winters",
        # fourth-continuation additions
        "ts_kalman_filter",
        "ts_rolling_median",
        "ts_burn_rate",
        "ts_activity_streaks",
        "ts_multi_resolution",
        "ts_seasonal_decompose",
        "ts_top_movers",
        "ts_interval_coverage",
        "ts_markov_transitions",
        "ts_attribution_linear",
        "ts_burstiness",
        "ts_acf",
        "ts_haar_energy",
        "ts_survival_km",
        "ts_incident_mttr",
        "ts_apdex",
        # round-7 sketch twins (events-domain)
        "ts_qdigest_quantiles",
        # round-8 additions: the two bounded Theil-Sen scale paths —
        # unlike the full estimator these are IN-contract at 10M rows
        # (O(n_s*W) and O(n_s + K^2) per series respectively)
        "ts_theil_sen_windowed",
        "ts_theil_sen_sampled",
        # round-10 window members never probed beyond sf0.1
        "ts_time_of_day_circular",
        "ts_variance_ratio",
        "ts_user_hod_entropy",
        "ts_effective_sample_size",
        "ts_channel_breakouts",
    ]
    if rows <= 2_000_000:
        # O(n_s^2) pair expansion: at 10M rows / 10k users the pair set
        # is ~5e9 — outside the bounded-series contract this operator
        # documents. Probe it at <=2M rows (docs/scale.md).
        names.append("ts_theil_sen")
    timings = {}
    ran = 0

    def run_one(n):
        # r9: restart the session every 15 probes. A single long-lived
        # local[32] JVM accumulates enough heap pressure over ~45
        # heavy queries that JDK-17 G1's GCLocker retry limit can trip
        # on the collect_list-frame sorts (observed once at query #44;
        # the same query passes solo in 39 s). Probes are independent,
        # so a fresh JVM per chunk costs ~5 s and removes the flake.
        nonlocal spark, reg, ran
        if ran and ran % 15 == 0:
            spark.stop()
            spark = get_spark("scale-probe")
            reg = load_all()
        ran += 1
        t0 = time.time()
        reg[n].fn(spark, path).write.mode("overwrite").format("noop").save()
        timings[n] = round(time.time() - t0, 2)
        print(f"  {n}: {timings[n]}s", file=sys.stderr)

    for n in names:
        run_one(n)
    for n in ["doc_repetition_filter", "doc_dedup_stats", "doc_mixture_sample",
              "doc_inverted_index", "doc_bm25", "doc_pmi_bigrams",
              "doc_sentence_stats", "doc_zipf_fit", "doc_rake_keywords",
              # round-7 sketch twins (document-domain)
              "doc_cms_heavy_md5", "doc_rle_ratio",
              # round-9: the span family probed against planted
              # repeats (VERDICT r8 item 3)
              "doc_repeated_spans", "doc_span_dedup_stats"]:
        run_one(n)
    n_vecs = max(50_000, rows // 20)
    if not Path(f"{path}/embeddings.parquet").exists():
        build_embeddings(spark, path, n_vecs)
    run_one("emb_kmeans")
    print(f"  ({n_vecs} vecs)", file=sys.stderr)
    print(json.dumps({"rows": rows, "users": users, "docs": n_docs, "queries": timings}))
    spark.stop()


def main_names() -> None:
    """Ad-hoc probe runner (r10): `--names q1,q2,... --dir PATH` runs
    the named registry queries against an existing probe corpus dir,
    with the restart-every-15 GCLocker guard AND a restart after any
    error (a heap-blown JVM poisons every later query in the session —
    the r10 triangle-probe lesson). This is the harness the r10/r11
    window gates used; it replaces per-round one-off scripts."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True, help="comma-separated query names")
    ap.add_argument("--dir", required=True, help="probe corpus directory")
    args = ap.parse_args()

    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.session import get_spark

    spark = get_spark("scale-probe-names")
    reg = load_all()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    missing = [n for n in names if n not in reg]
    if missing:
        raise SystemExit(f"not registered: {missing}")
    timings: dict[str, object] = {}

    def restart():
        nonlocal spark, reg
        try:
            spark.stop()
        except Exception:
            pass
        spark = get_spark("scale-probe-names")
        reg = load_all()

    for i, n in enumerate(names):
        if i and i % 15 == 0:
            restart()
        t0 = time.time()
        try:
            reg[n].fn(spark, args.dir).write.mode("overwrite").format(
                "noop"
            ).save()
            timings[n] = round(time.time() - t0, 2)
            print(f"  {n}: {timings[n]}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — probe harness records and moves on
            timings[n] = f"ERROR {type(e).__name__}: {str(e)[:300]}"
            print(f"  {n}: {timings[n]}", file=sys.stderr)
            restart()
    print(json.dumps({"dir": args.dir, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    if "--names" in sys.argv:
        main_names()
    else:
        main()

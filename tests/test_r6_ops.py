"""Round-6 operator tests on planted data: M4 downsampling witness
points, seasonal-baseline flags, Holt linear smoothing vs a pure-Python
recursion, and BM25 vs a hand-computed score — edge cases the fixture
tables can't force (value ties, cold-start seasons, zero-match docs).
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from chrono_ts_spark.queries import load_all

REG = load_all()


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def t(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


class TestM4Downsample:
    def test_witness_points_and_tie_break(self, spark, tmp_path):
        # one 15-min bucket, value tie on the max (5.0 at :01 and :05):
        # the max witness must be the LATEST (value, ts, event_id) and
        # the min witness the EARLIEST — the documented convention.
        rows = [
            (1, t(0, 1), 1, "a", 5.0, "{}"),
            (2, t(0, 3), 1, "a", 2.0, "{}"),
            (3, t(0, 5), 1, "a", 5.0, "{}"),
            (4, t(0, 7), 1, "a", 2.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_m4_downsample"].fn(spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.t_first, r.v_first) == ("2024-01-01 00:01:00", 5.0)
        assert (r.t_last, r.v_last) == ("2024-01-01 00:07:00", 2.0)
        # min value 2.0 first occurs at :03; max value 5.0 last occurs at :05
        assert (r.t_min, r.v_min) == ("2024-01-01 00:03:00", 2.0)
        assert (r.t_max, r.v_max) == ("2024-01-01 00:05:00", 5.0)
        assert r.n_events == 4

    def test_bucket_split(self, spark, tmp_path):
        rows = [
            (1, t(0, 0), 1, "a", 1.0, "{}"),
            (2, t(0, 20), 1, "a", 2.0, "{}"),  # second 15-min bucket
        ]
        sf = _write_events(spark, tmp_path, rows)
        assert REG["ts_m4_downsample"].fn(spark, sf).count() == 2


class TestSeasonalBaseline:
    def test_flag_and_cold_start(self, spark, tmp_path):
        # hour-of-day 0 across 3 days: counts 1, 1, 4 -> total 6, n 3.
        # Bucket with 4 events: 4*3*2=24 > 6*3=18 -> is_high.
        # Hour 1 appears on only 2 days -> suppressed (season_n < 3).
        rows = []
        eid = 0
        for day, n_ev in [(1, 1), (2, 1), (3, 4)]:
            for k in range(n_ev):
                eid += 1
                rows.append(
                    (eid, datetime(2024, 1, day, 0, 10 + k), 1, "a", 1.0, "{}")
                )
        for day in (1, 2):
            eid += 1
            rows.append((eid, datetime(2024, 1, day, 1, 0), 1, "a", 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = {r.bucket_ts: r for r in REG["ts_seasonal_baseline"].fn(spark, sf).collect()}
        assert set(out) == {
            "2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00"
        }  # hour-1 buckets suppressed
        burst = out["2024-01-03 00:00:00"]
        assert (burst.cnt, burst.season_total, burst.season_n) == (4, 6, 3)
        assert burst.is_high == 1 and burst.load_factor == 2.0
        assert out["2024-01-01 00:00:00"].is_high == 0


class TestHoltLinear:
    def test_matches_python_recursion(self, spark, tmp_path):
        vals = [10.0, 12.0, 11.0, 15.0, 9.0, 14.0]
        rows = [
            (i + 1, t(0, i), 1, "a", v, "{}") for i, v in enumerate(vals)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = sorted(
            REG["ts_holt_linear"].fn(spark, sf).collect(), key=lambda r: r.event_id
        )
        a, b1, g, g1 = 0.3, 1.0 - 0.3, 0.1, 1.0 - 0.1
        l = trd = 0.0
        for i, (v, r) in enumerate(zip(vals, out)):
            if i == 0:
                l, trd = v, 0.0
            else:
                nl = a * v + b1 * (l + trd)
                trd = g * (nl - l) + g1 * trd
                l = nl
            assert r.level == l and r.trend == trd  # bit-exact
            assert r.forecast_next == l + trd

    def test_single_point_series(self, spark, tmp_path):
        sf = _write_events(spark, tmp_path, [(1, t(0), 1, "a", 7.0, "{}")])
        r = REG["ts_holt_linear"].fn(spark, sf).collect()[0]
        assert (r.level, r.trend, r.forecast_next) == (7.0, 0.0, 7.0)


class TestBM25:
    def test_hand_computed_score(self, spark, tmp_path):
        # 4 docs; terms: batch (df=2), scan (df=1), dup (df=0).
        docs = [
            (0, "batch scan batch", "en", "s", 16),
            (1, "batch other words here", "en", "s", 22),
            (2, "nothing relevant", "en", "s", 16),
            (3, "plain filler text again", "en", "s", 23),
        ]
        sf = _write_docs(spark, tmp_path, docs)
        out = {r.doc_id: r for r in REG["doc_bm25"].fn(spark, sf).collect()}
        assert set(out) == {0, 1}  # only docs matching >= 1 term
        n, sum_dl = 4, 3 + 4 + 2 + 4
        k1, b = 1.2, 0.75

        def term(tf, df, dl):
            if tf == 0:
                return 0.0
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            return idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (dl * n / sum_dl))
            )

        assert out[0].tf0 == 2 and out[0].tf1 == 1 and out[0].tf2 == 0
        assert out[0].score == pytest.approx(
            round(term(2, 2, 3) + term(1, 1, 3) + 0.0, 6), abs=1e-9
        )
        assert out[1].score == pytest.approx(round(term(1, 2, 4), 6), abs=1e-9)
        # rarer term (scan, df=1) must outscore the commoner one at
        # equal tf/dl: doc 0's scan term > its per-occurrence batch term
        assert term(1, 1, 3) > term(1, 2, 3)


class TestSimhashMd5:
    def test_clusters_and_order_invariance(self, spark, tmp_path):
        docs = [
            (0, "alpha beta gamma delta", "en", "s", 22),
            (1, "delta gamma beta alpha", "en", "s", 22),  # permutation
            (2, "alpha beta gamma delta", "en", "s", 22),  # exact dup
            (3, "totally different words here now", "en", "s", 32),
        ]
        sf = _write_docs(spark, tmp_path, docs)
        out = REG["doc_simhash_md5"].fn(spark, sf).collect()
        by_docs = {tuple(int(x) for x in r.doc_ids.split(",")): r for r in out}
        # tf-weighted votes are order-independent: 0, 1, 2 share one
        # fingerprint; doc 3 lands elsewhere
        assert (0, 1, 2) in by_docs
        assert by_docs[(0, 1, 2)].n_docs == 3
        assert (3,) in by_docs
        assert len(out) == 2
        # halves stay in unsigned-32 range (BIGINT-safe on both engines)
        for r in out:
            assert 0 <= r.sim_hi < 2**32 and 0 <= r.sim_lo < 2**32


class TestAcctbalDistributionRewrite:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 41])
    def test_matches_builtin_window_functions(self, spark, tmp_path, n):
        # r6: the prefix-sum W6 rewrite must reproduce Spark's own
        # ntile/percent_rank/cume_dist bit-for-bit at every small-N
        # edge (single row, N < tiles, N % 4 != 0).
        import pathlib
        import tempfile

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rows = [(i + 1, float((i * 37) % 19) - 5.0) for i in range(n)]
        df = spark.createDataFrame(rows, "c_custkey long, c_acctbal double")
        full = df.select(
            "c_custkey",
            "c_acctbal",
            F.lit("x").alias("c_name"),
            F.lit("x").alias("c_address"),
            F.lit(0).cast("long").alias("c_nationkey"),
            F.lit("x").alias("c_phone"),
            F.lit("x").alias("c_mktsegment"),
            F.lit("x").alias("c_comment"),
        )
        tmp = pathlib.Path(tempfile.mkdtemp())
        full.coalesce(1).write.mode("overwrite").parquet(str(tmp / "customer.parquet"))
        got = {
            r.c_custkey: r
            for r in REG["rel_acctbal_distribution"].fn(spark, str(tmp)).collect()
        }
        w = Window.orderBy("c_acctbal", "c_custkey")
        want = {
            r.c_custkey: r
            for r in df.select(
                "c_custkey",
                F.ntile(4).over(w).alias("quartile"),
                F.percent_rank().over(w).alias("pct_rank"),
                F.cume_dist().over(w).alias("cume"),
            ).collect()
        }
        assert len(got) == n
        for k, e in want.items():
            g = got[k]
            assert (g.quartile, g.pct_rank, g.cume) == (
                e.quartile, e.pct_rank, e.cume,
            ), (n, k)


class TestMadOutliers:
    def test_known_outlier_and_constant_series(self, spark, tmp_path):
        # series "a": med=4, MAD=2, threshold 4.4478*2=8.8956 -> only
        # the 100.0 point (adev 96) flags. series "flat": MAD=0 ->
        # threshold 0, all deviations 0 -> nothing flags.
        vals_a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 100.0]
        rows = [
            (i + 1, t(0, i), 1, "a", v, "{}") for i, v in enumerate(vals_a)
        ] + [
            (100 + i, t(0, i), 1, "flat", 5.0, "{}") for i in range(5)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = {r.event_type: r for r in REG["ts_mad_outliers"].fn(spark, sf).collect()}
        a = out["a"]
        assert (a.n, a.med, a.mad, a.n_outliers) == (7, 4.0, 2.0, 1)
        assert (a.min_outlier, a.max_outlier) == (100.0, 100.0)
        f = out["flat"]
        assert (f.med, f.mad, f.n_outliers) == (5.0, 0.0, 0)
        assert f.min_outlier is None and f.max_outlier is None


class TestUnigramLogprob:
    def test_hand_computed(self, spark, tmp_path):
        import math

        docs = [
            (0, "a a b", "en", "s", 5),
            (1, "c", "en", "s", 1),
        ]
        sf = _write_docs(spark, tmp_path, docs)
        out = {r.doc_id: r for r in REG["doc_unigram_logprob"].fn(spark, sf).collect()}

        def fp(p):
            return int(round(round(math.log(p), 6) * 1e6))

        # vocab: a=2, b=1, c=1, total=4
        assert out[0].n_tok == 3
        assert out[0].sum_logprob_fp == 2 * fp(0.5) + fp(0.25)
        assert out[0].mean_logprob == out[0].sum_logprob_fp / 3 / 1e6
        assert out[1].sum_logprob_fp == fp(0.25)
        # the common-token doc scores higher (less surprising)
        assert out[0].mean_logprob > out[1].mean_logprob


class TestCsvMalformed:
    def test_permissive_accounting(self, spark):
        out = {
            r.src: r
            for r in REG["io_csv_malformed"].fn(spark, "/root/testdata/sf0.001").collect()
        }
        # clean: 40 rows, sum 0/2 + 1/2 + ... + 39/2 = 390.0
        assert (out["clean"].n_rows, out["clean"].n_corrupt) == (40, 0)
        assert out["clean"].clean_value_sum == 390.0
        # type-broken: every row dead-lettered via the corrupt column
        assert (out["badtype"].n_rows, out["badtype"].n_corrupt) == (10, 10)
        # arity-short: accepted with null value, NOT corrupt (the
        # PERMISSIVE null-fill rule this test exists to pin)
        assert (out["badarity"].n_rows, out["badarity"].n_corrupt) == (5, 0)
        assert out["badarity"].clean_value_sum is None

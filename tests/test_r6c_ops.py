"""Fourth round-6 continuation block, planted-data tests: market-basket
measure algebra, banded global rank vs the sorted() reference (band
boundaries + ties), RFM quartile assignment, and gaps-and-islands
streak edges — cases the fixture tables can't force.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from chrono_ts_spark.operators.rank import global_rank
from chrono_ts_spark.queries import load_all

REG = load_all()

D0 = datetime(2024, 3, 1)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestMarketBasket:
    def test_planted_lift(self, spark, tmp_path):
        # 100 baskets: 60 contain brands A+B, 20 only A, 20 only B.
        # n_pair=60, n_a=n_b=80 -> support .6, conf .75, lift 0.9375.
        li, pt = [], []
        pt.append((1, "p1", "Brand#A", "t", 1, 1.0))
        pt.append((2, "p2", "Brand#B", "t", 1, 1.0))
        for ok in range(1, 101):
            if ok <= 60:
                li.append((ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
                li.append((ok, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
            elif ok <= 80:
                li.append((ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
            else:
                li.append((ok, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            pt,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
        rows = REG["rel_market_basket"].fn(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.brand_a, r.brand_b) == ("Brand#A", "Brand#B")
        assert (r.n_pair, r.n_a, r.n_b) == (60, 80, 80)
        assert r.support == 0.6
        assert r.conf_ab == 0.75 and r.conf_ba == 0.75
        assert r.lift == 0.9375

    def test_duplicate_lines_count_once(self, spark, tmp_path):
        # The same brand twice in one order must not inflate pair counts
        # (DISTINCT-first contract). 50 orders with A twice + B once.
        li = []
        for ok in range(1, 51):
            li.append((ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
            li.append((ok, 1, 1, 2, 2.0, 1.0, 0.0, 0.0, "N", "O", D0))
            li.append((ok, 2, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            [(1, "p1", "Brand#A", "t", 1, 1.0), (2, "p2", "Brand#B", "t", 1, 1.0)],
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
        r = REG["rel_market_basket"].fn(spark, str(tmp_path)).collect()[0]
        assert (r.n_pair, r.n_a, r.n_b) == (50, 50, 50)
        assert r.lift == 1.0 and r.support == 1.0


class TestGlobalRank:
    def test_matches_sorted_reference_across_bands(self, spark):
        # Values straddle digit-count band boundaries (9|10, 99|100) and
        # include ties resolved by the tiebreak column.
        vals = [3, 9, 10, 10, 11, 99, 100, 100, 101, 5, 10, 1000, 0]
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            (r.k, r.v): r.r
            for r in global_rank(df, "v", ["k"], out="r").collect()
        }
        expect = {
            (k, v): i + 1
            for i, (v, k) in enumerate(sorted((v, k) for k, v in rows))
        }
        assert got == expect

    def test_descending(self, spark):
        rows = [(1, 7), (2, 70), (3, 7), (4, 700)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r.k: r.r
            for r in global_rank(df, "v", ["k"], ascending=False, out="r").collect()
        }
        assert got == {4: 1, 2: 2, 1: 3, 3: 4}


class TestRFM:
    def test_planted_scores(self, spark, tmp_path):
        # 8 customers, one order each, constructed so all three metric
        # rankings coincide with custkey order.  n=8: ranks 1-2 -> bottom
        # quartile, 3-4, 5-6, 7-8 (score = 1 + (rank-1)*4 div 8).
        orders = []
        for c in range(1, 9):
            # customer c orders on day c (recency rank: c=8 most recent),
            # spend 100*c (monetary rank asc = custkey order).
            for k in range(c):  # frequency = c orders
                orders.append(
                    (
                        c * 100 + k,
                        c,
                        "O",
                        100.0 * c / c,  # per-order spend: total = 100*c
                        D0 + timedelta(days=c),
                        "1-URGENT",
                    )
                )
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        cells = REG["rel_rfm_segments"].fn(spark, str(tmp_path)).collect()
        # customer c: recency_days = 8-c (asc rank = 9-c), freq rank = c,
        # monetary rank = c.  r_score = 4 - (rank_r-1)*4 div 8 where
        # rank_r = 9-c; f_score = m_score = 1 + (c-1)*4 div 8.
        expect = {}
        for c in range(1, 9):
            r_s = 4 - ((9 - c) - 1) * 4 // 8
            fm_s = 1 + (c - 1) * 4 // 8
            key = (r_s, fm_s, fm_s)
            n, tot = expect.get(key, (0, 0.0))
            expect[key] = (n + 1, tot + 100.0 * c)
        got = {
            (r.r_score, r.f_score, r.m_score): (r.n_customers, r.total_monetary)
            for r in cells
        }
        assert got == {k: (n, round(t, 2)) for k, (n, t) in expect.items()}


class TestActivityStreaks:
    def test_planted_islands(self, spark, tmp_path):
        # user 1: days 0,1,2,5,7,8 -> streaks (3,1,2); user 2: day 4 only.
        rows, eid = [], 0
        for d in [0, 1, 2, 5, 7, 8]:
            eid += 1
            rows.append((eid, D0 + timedelta(days=d, hours=3), 1, "a", 1.0, "{}"))
        # two events same day must collapse to one active day
        rows.append((98, D0 + timedelta(days=0, hours=9), 1, "b", 1.0, "{}"))
        rows.append((99, D0 + timedelta(days=4), 2, "a", 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {
            r.user_id: (r.n_streaks, r.longest_streak, r.active_days)
            for r in REG["ts_activity_streaks"].fn(spark, sf).collect()
        }
        assert got == {1: (3, 3, 6), 2: (1, 1, 1)}

    def test_midnight_boundary(self, spark, tmp_path):
        # 23:59 and next-day 00:00 are different days -> one 2-day streak.
        rows = [
            (1, D0 + timedelta(hours=23, minutes=59), 1, "a", 1.0, "{}"),
            (2, D0 + timedelta(days=1), 1, "a", 1.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = REG["ts_activity_streaks"].fn(spark, sf).collect()
        assert (got[0].n_streaks, got[0].longest_streak, got[0].active_days) == (
            1,
            2,
            2,
        )


class TestDQExpectations:
    def test_planted_violations(self, spark, tmp_path):
        # order 2 -> nonexistent customer; doc 2 lies about n_chars;
        # order 3 has a bad status; lineitem 9 orphaned.
        spark.createDataFrame(
            [(1, "c1", 0, 1.0, "SEG")],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
            "c_mktsegment string",
        ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            [
                (1, 1, "O", 10.0, D0, "1-URGENT"),
                (2, 999, "F", 10.0, D0, "1-URGENT"),
                (3, 1, "X", 10.0, D0, "1-URGENT"),
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            [
                (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0),
                (9, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            [(1, D0, 1, "a", 1.0, "{}"), (2, datetime(1999, 1, 1), 1, "a", 1.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        spark.createDataFrame(
            [(1, "abc", "en", "s", 3), (2, "abc", "en", "s", 99)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {
            r.check_name: (r.n_checked, r.n_violations)
            for r in REG["dq_expectations"].fn(spark, str(tmp_path)).collect()
        }
        assert got == {
            "orders.fk_custkey_valid": (3, 1),
            "lineitem.fk_orderkey_valid": (2, 1),
            "customer.pk_unique": (1, 0),
            "events.ts_in_range": (2, 1),
            "documents.n_chars_matches_text": (2, 1),
            "orders.status_accepted": (3, 1),
        }


class TestKeySkew:
    def test_planted_distribution(self, spark, tmp_path):
        # user sizes: [1, 1, 2, 4] -> n_keys=4, n_rows=8, max=4,
        # p50 = 1 (cum 2/4 >= .5), p99 = 4, top1 = .5,
        # gini: sorted x=[1,1,2,4], S1=1+2+6+16=25,
        #   G = (2*25 - 5*8)/(4*8) = 10/32 = 0.3125
        rows, eid = [], 0
        for u, n in [(1, 1), (2, 1), (3, 2), (4, 4)]:
            for i in range(n):
                eid += 1
                rows.append((eid, D0 + timedelta(minutes=eid), u, "a", 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        # the query also reads lineitem — give it a trivial one
        spark.createDataFrame(
            [(1, 7, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0)],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {
            r.key_name: r
            for r in REG["diag_key_skew"].fn(spark, sf).collect()
        }
        r = got["events.user_id"]
        assert (r.n_keys, r.n_rows, r.max_size) == (4, 8, 4)
        assert (r.p50_size, r.p99_size) == (1, 4)
        assert r.top1_share == 0.5
        assert r.gini == 0.3125
        # single uniform key -> gini 0
        ru = got["lineitem.l_partkey"]
        assert (ru.n_keys, ru.gini) == (1, 0.0)


class TestBurnRate:
    def test_threshold_boundary(self, spark, tmp_path):
        # budget 20%, fast burn needs 1h rate >= 40% AND 6h rate >= 20%.
        # hour 0: 2 fails / 5 = 40% -> fires (>= is inclusive).
        # hour 1: 1 fail  / 5 = 20% -> 1h gate fails, no alert.
        rows, eid = [], 0
        for h, fails in [(0, 2), (1, 1)]:
            for i in range(5):
                eid += 1
                v = 400.0 if i < fails else 10.0
                rows.append(
                    (eid, D0 + timedelta(hours=h, minutes=i), 1, "api", v, "{}")
                )
        sf = _write_events(spark, tmp_path, rows)
        out = {r.h: r for r in REG["ts_burn_rate"].fn(spark, sf).collect()}
        h0 = min(out)
        assert out[h0].fast_burn == 1
        assert out[h0].rate_1h == 0.4
        assert out[h0 + 1].fast_burn == 0
        assert out[h0 + 1].rate_6h == 0.3  # 3 fails / 10 over both hours

    def test_range_window_skips_gaps(self, spark, tmp_path):
        # events in hour 0 and hour 10: the 6h trailing window at hour 10
        # must NOT include hour 0 (a ROWS frame would).
        rows = [
            (1, D0, 1, "api", 400.0, "{}"),
            (2, D0 + timedelta(hours=10), 1, "api", 10.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = sorted(
            REG["ts_burn_rate"].fn(spark, sf).collect(), key=lambda r: r.h
        )
        assert out[1].total_6h == 1 and out[1].fails_6h == 0


class TestRollingMedian:
    def test_planted_frames(self, spark, tmp_path):
        # values 1..5 then a 100x spike: the trailing-7 median must not
        # chase the spike (robustness), the mean would.
        vals = [10.0, 20.0, 30.0, 40.0, 50.0, 5000.0]
        rows = [
            (i + 1, D0 + timedelta(minutes=i), 1, "a", v, "{}")
            for i, v in enumerate(vals)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = sorted(
            REG["ts_rolling_median"].fn(spark, sf).collect(),
            key=lambda r: r.event_id,
        )
        meds = [r.rolling_median for r in out]
        # frames: [10] [10,20] [10..30] [10..40] [10..50] [10..50,5000]
        assert meds == [10.0, 15.0, 20.0, 25.0, 30.0, 35.0]
        assert out[1].median_cents_x2 == 1000 + 2000  # even frame: sum of mids
        assert out[5].n_win == 6

    def test_window_caps_at_seven(self, spark, tmp_path):
        rows = [
            (i + 1, D0 + timedelta(minutes=i), 1, "a", float(i + 1), "{}")
            for i in range(10)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = sorted(
            REG["ts_rolling_median"].fn(spark, sf).collect(),
            key=lambda r: r.event_id,
        )
        assert out[-1].n_win == 7
        assert out[-1].rolling_median == 7.0  # median of 4..10


class TestKalmanFilter:
    def test_matches_python_reference(self, spark, tmp_path):
        vals = [10.0, 12.0, 9.5, 11.0, 10.5, 30.0, 10.0]
        rows = [
            (i + 1, D0 + timedelta(minutes=i), 1, "a", v, "{}")
            for i, v in enumerate(vals)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = sorted(
            REG["ts_kalman_filter"].fn(spark, sf).collect(),
            key=lambda r: r.event_id,
        )
        x = p = 0.0
        for i, z in enumerate(vals):
            if i == 0:
                x, p = z, 4.0
            else:
                pp = p + 1.0
                k = pp / (pp + 4.0)
                x = x + k * (z - x)
                p = (1.0 - k) * pp
            assert out[i].kalman == x  # bit-exact
            assert out[i].err_var == p

    def test_gain_converges(self, spark, tmp_path):
        # err_var must converge monotonically to the steady-state
        # P* solving P = (1-K)(P+Q):  P* = (-Q + sqrt(Q^2+4QR))/2 ~ 1.56
        rows = [
            (i + 1, D0 + timedelta(minutes=i), 1, "a", 5.0, "{}")
            for i in range(30)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = sorted(
            REG["ts_kalman_filter"].fn(spark, sf).collect(),
            key=lambda r: r.event_id,
        )
        ps = [r.err_var for r in out]
        assert all(ps[i + 1] <= ps[i] for i in range(1, len(ps) - 1))
        steady = (-1.0 + (1.0 + 16.0) ** 0.5) / 2.0
        assert abs(ps[-1] - steady) < 1e-6
        assert all(r.kalman == 5.0 for r in out)  # constant signal passthrough


class TestEmbOutliers:
    def _write_emb(self, spark, tmp_path, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_planted_outlier(self, spark, tmp_path):
        # 20 vectors near the origin, one far away -> exactly 1 outlier.
        rows = []
        for i in range(20):
            v = [0.0] * 64
            v[i % 4] = 0.1 if i % 2 == 0 else -0.1
            rows.append((i, [float(x) for x in v], 0))
        far = [3.0] * 64
        rows.append((99, [float(x) for x in far], 0))
        sf = self._write_emb(spark, tmp_path, rows)
        out = REG["emb_outliers"].fn(spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_vectors, r.n_outliers) == (21, 1)
        assert r.max_dist > 20.0  # ~ sqrt(64*9)

    def test_zero_variance_no_outliers(self, spark, tmp_path):
        # identical vectors: sigma = 0 and every distance = mean -> the
        # strict > gate must flag nothing (no divide-by-zero path).
        rows = [(i, [1.0] * 64, 7) for i in range(5)]
        sf = self._write_emb(spark, tmp_path, rows)
        out = REG["emb_outliers"].fn(spark, sf).collect()
        assert out[0].n_outliers == 0
        assert out[0].mean_dist == 0.0


class TestRakeKeywords:
    def _write_docs(self, spark, tmp_path, texts):
        rows = [
            (i + 1, t, "en", "test", len(t)) for i, t in enumerate(texts)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_planted_scores(self, spark, tmp_path):
        # "red apple" twice, "apple" alone once, stopwords delimit.
        # freq(red)=2 deg(red)=4; freq(apple)=3 deg(apple)=5.
        # score(red)=2.0, score(apple)=5/3 -> phrase "red apple" =
        # 2.0 + 1.666666 = 3.666666 (integer fixed point, floor div).
        sf = self._write_docs(
            spark,
            tmp_path,
            ["red apple on the red apple", "the apple is good"],
        )
        out = {r.phrase: r for r in REG["doc_rake_keywords"].fn(spark, sf).collect()}
        assert out["red apple"].n_occ == 2
        assert out["red apple"].n_words == 2
        assert out["red apple"].rake_score == 3.666666
        assert out["apple"].rake_score == 1.666666
        assert out["good"].rake_score == 1.0

    def test_long_runs_excluded(self, spark, tmp_path):
        # a 5-word stopword-free run must not produce a candidate phrase
        sf = self._write_docs(spark, tmp_path, ["one two three four five"])
        out = REG["doc_rake_keywords"].fn(spark, sf).collect()
        assert out == []

    def test_punctuation_splits_words(self, spark, tmp_path):
        # punctuation is a word separator, not part of a word
        sf = self._write_docs(spark, tmp_path, ["fast,car the fast car"])
        out = {r.phrase: r for r in REG["doc_rake_keywords"].fn(spark, sf).collect()}
        assert out["fast car"].n_occ == 2


class TestCompaction:
    def test_lossless_and_fewer_files(self, spark):
        sf = "/root/testdata/sf0.001"
        r = REG["io_compaction"].fn(spark, sf).collect()[0]
        assert r.files_before == 50
        assert r.compacted == 1  # files_after < files_before
        assert r.sized_to_target == 1  # files_after == ceil(bytes/8MB)
        src = spark.read.parquet(f"{sf}/events.parquet")
        import pyspark.sql.functions as F

        exp = src.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("event_id").alias("se"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("sc"),
        ).collect()[0]
        assert (r.rows, r.sum_event_id, r.sum_cents) == (exp.rows, exp.se, exp.sc)


class TestMultiResolution:
    def test_tier_algebra(self, spark, tmp_path):
        # planted events across 2 days; every coarser bucket must equal
        # the sum of its finer children, and all tiers the same total.
        rows, eid = [], 0
        for h in [0, 1, 5, 7, 23, 24, 30, 47]:
            for k in range(h % 3 + 1):
                eid += 1
                rows.append(
                    (eid, D0 + timedelta(hours=h, minutes=k), 1, "a",
                     float(h + 1), "{}")
                )
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_multi_resolution"].fn(spark, sf).collect()
        tiers = {}
        for r in out:
            tiers.setdefault(r.width_s, {})[r.bucket] = (r.cents, r.n)
        assert set(tiers) == {3600, 21600, 86400}
        for coarse, div in [(21600, 6), (86400, 24)]:
            for b, (c, n) in tiers[coarse].items():
                fine_c = sum(v[0] for h, v in tiers[3600].items() if h // div == b)
                fine_n = sum(v[1] for h, v in tiers[3600].items() if h // div == b)
                assert (c, n) == (fine_c, fine_n)
        totals = {w: sum(v[1] for v in d.values()) for w, d in tiers.items()}
        assert len(set(totals.values())) == 1


class TestSeasonalDecompose:
    def test_constant_series_zero_seasonal(self, spark, tmp_path):
        rows = [
            (h + 1, D0 + timedelta(hours=h), 1, "a", 10.0, "{}")
            for h in range(72)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_seasonal_decompose"].fn(spark, sf).collect()
        assert len(out) > 0
        assert all(r.seasonal_component == 0.0 for r in out)

    def test_planted_spike_hour(self, spark, tmp_path):
        # hour-of-day 5 always 10x: its seasonal component must be the
        # unique positive one, others negative; components sum ~ 0.
        rows = []
        for h in range(24 * 7):
            v = 100.0 if h % 24 == 5 else 10.0
            rows.append((h + 1, D0 + timedelta(hours=h), 1, "a", v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = {r.hod: r.seasonal_component for r in
               REG["ts_seasonal_decompose"].fn(spark, sf).collect()}
        assert len(out) == 24
        assert out[5] == max(out.values()) and out[5] > 50
        assert all(v < 0 for h, v in out.items() if h != 5)
        assert abs(sum(out.values())) < 1.0


class TestCohortLTV:
    def test_planted_cells(self, spark, tmp_path):
        # cust 1: orders in 2024-01 ($10), 2024-03 ($20)
        # cust 2: orders in 2024-03 ($5, $7)
        orders = [
            (1, 1, "O", 10.0, datetime(2024, 1, 15), "1-URGENT"),
            (2, 1, "O", 20.0, datetime(2024, 3, 2), "1-URGENT"),
            (3, 2, "O", 5.0, datetime(2024, 3, 10), "1-URGENT"),
            (4, 2, "O", 7.0, datetime(2024, 3, 20), "1-URGENT"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {
            (r.cohort_month, r.age_months): (r.n_active, r.revenue, r.cum_revenue)
            for r in REG["rel_cohort_ltv"].fn(spark, str(tmp_path)).collect()
        }
        assert got == {
            ("2024-01", 0): (1, 10.0, 10.0),
            ("2024-01", 2): (1, 20.0, 30.0),
            ("2024-03", 0): (1, 12.0, 12.0),
        }


class TestContainment:
    def test_subset_doc_full_containment(self, spark, tmp_path):
        # doc 2's shingles are a strict subset of doc 1's -> the
        # asymmetry Jaccard can't see: containment_ba = 1.0.
        long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        short = "alpha beta gamma delta epsilon zeta"
        rows = [
            (1, long, "en", "s", len(long)),
            (2, short, "en", "s", len(short)),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = REG["doc_containment_adjacent"].fn(spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.containment_ba == 1.0  # short fully inside long
        assert r.containment_ab < 1.0
        assert r.n_common == r.n_b


class TestTopMovers:
    def test_planted_moves_and_gap_guard(self, spark, tmp_path):
        # day 0: a=100, b=100; day 1: a=150 (+50%), b=90 (-10%);
        # day 3 (after a gap): a=999 -> NOT a day-over-day move.
        rows = [
            (1, D0, 1, "a", 100.0, "{}"),
            (2, D0, 1, "b", 100.0, "{}"),
            (3, D0 + timedelta(days=1), 1, "a", 150.0, "{}"),
            (4, D0 + timedelta(days=1), 1, "b", 90.0, "{}"),
            (5, D0 + timedelta(days=3), 1, "a", 999.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_top_movers"].fn(spark, sf).collect()
        d1 = min(r.d for r in out)
        got = {(r.d, r.event_type): (r.pct_change, r.rnk) for r in out}
        assert got == {(d1, "a"): (0.5, 1), (d1, "b"): (-0.1, 2)}
        # the post-gap day must not appear at all
        assert all(r.d == d1 for r in out)


class TestRecallEval:
    def test_arithmetic_and_fixture_floor(self, spark):
        # strict >= 0.9 recall pins live on clustered data in
        # test_dedup_similarity; the fixture embeddings are near-uniform
        # so here we pin the report's internal consistency + a loose floor.
        rows = REG["emb_recall_eval"].fn(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 10
        for r in rows:
            assert r.n_exact == 5
            assert 0 <= r.n_hits <= r.n_exact
            assert r.recall == round(r.n_hits / r.n_exact, 6)
        assert sum(r.recall for r in rows) / len(rows) >= 0.1


class TestBandedPrefixSum:
    def test_matches_python_reference(self, spark):
        from chrono_ts_spark.operators.rank import banded_prefix_sum

        vals = [(1, 9, 10), (2, 10, 20), (3, 10, 30), (4, 100, 5), (5, 7, 1),
                (6, 1000, 2), (7, 99, 4)]
        df = spark.createDataFrame(vals, "k long, key long, v long")
        got = {
            r.k: r.cum
            for r in banded_prefix_sum(
                df, "key", ["k"], "v", ascending=False, out="cum"
            ).collect()
        }
        order = sorted(vals, key=lambda t: (-t[1], t[0]))
        run, expect = 0, {}
        for k, _, v in order:
            run += v
            expect[k] = run
        assert got == expect


class TestLabelAffinity:
    def _write(self, spark, tmp_path, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_orthogonal_and_identical_clusters(self, spark, tmp_path):
        # labels 0 and 1 on orthogonal axes -> cosine 0; label 2 is a
        # copy of label 0 -> cosine 1, l2 0.
        e0 = [1.0] + [0.0] * 63
        e1 = [0.0, 1.0] + [0.0] * 62
        rows = (
            [(i, e0, 0) for i in range(3)]
            + [(10 + i, e1, 1) for i in range(3)]
            + [(20 + i, e0, 2) for i in range(3)]
        )
        sf = self._write(spark, tmp_path, rows)
        got = {
            (r.label_a, r.label_b): (r.centroid_cosine, r.centroid_l2)
            for r in REG["emb_label_affinity"].fn(spark, sf).collect()
        }
        assert got[(0, 1)][0] == 0.0
        assert got[(0, 2)] == (1.0, 0.0)
        assert got[(1, 2)][0] == 0.0
        assert abs(got[(0, 1)][1] - 2 ** 0.5) < 1e-6


class TestABCAnalysis:
    def test_planted_pareto(self, spark, tmp_path):
        # revenues 80, 15, 3, 2 (no discount): cum shares 80/95/98/100
        # -> A={p1}, B={p2}, C={p3,p4} with boundary <= inclusive.
        li = []
        for pk, price in [(1, 80.0), (2, 15.0), (3, 3.0), (4, 2.0)]:
            li.append((pk, pk, 1, 1, 1.0, price, 0.0, 0.0, "N", "O", D0))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {
            r.abc_class: (r.n_parts, r.revenue, r.revenue_share)
            for r in REG["rel_abc_analysis"].fn(spark, str(tmp_path)).collect()
        }
        assert got == {
            "A": (1, 80.0, 0.8),
            "B": (1, 15.0, 0.15),
            "C": (2, 5.0, 0.05),
        }


class TestNgramNovelty:
    def _write_docs(self, spark, tmp_path, texts):
        rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_planted_novelty(self, spark, tmp_path):
        # doc 1: fresh; doc 2: identical copy -> novelty 0;
        # doc 3: half doc-1 material, half new.
        t1 = "a b c d e f g h i j"            # 6 shingles, all novel
        t3 = "a b c d e x y z w v u"          # shares 'a b c d e' start
        sf = self._write_docs(spark, tmp_path, [t1, t1, t3])
        got = {
            r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
            for r in REG["doc_ngram_novelty"].fn(spark, sf).collect()
        }
        assert got[1] == (6, 6, 1.0)
        assert got[2] == (6, 0, 0.0)
        n3, k3, nov3 = got[3]
        assert n3 == 7 and k3 == 6  # only shingle "a b c d e" is owned by doc 1
        assert nov3 == round(6 / 7, 6)


class TestIntervalCoverage:
    def test_planted_merge(self, spark, tmp_path):
        # user 1: events at 0min and 10min (overlap -> one 40-min span),
        # then 120min (separate). user 2: one event.
        rows = [
            (1, D0, 1, "a", 1.0, "{}"),
            (2, D0 + timedelta(minutes=10), 1, "a", 1.0, "{}"),
            (3, D0 + timedelta(minutes=120), 1, "a", 1.0, "{}"),
            (4, D0, 2, "a", 1.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {
            r.user_id: (r.n_merged, r.covered_us, r.longest_us)
            for r in REG["ts_interval_coverage"].fn(spark, sf).collect()
        }
        m40 = 40 * 60 * 1_000_000
        m30 = 30 * 60 * 1_000_000
        assert got[1] == (2, m40 + m30, m40)
        assert got[2] == (1, m30, m30)

    def test_swallowed_interval(self, spark, tmp_path):
        # lag-based merging fails here: event B starts inside A's span
        # and ends before A-extended C starts; the running-max catches
        # that A swallows B and chains into C.
        rows = [
            (1, D0, 1, "a", 1.0, "{}"),                        # [0, 30)
            (2, D0 + timedelta(minutes=5), 1, "a", 1.0, "{}"), # [5, 35)
            (3, D0 + timedelta(minutes=33), 1, "a", 1.0, "{}"),# [33, 63)
        ]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_interval_coverage"].fn(spark, sf).collect()[0]
        assert r.n_merged == 1
        assert r.covered_us == 63 * 60 * 1_000_000


class TestMMRDiversify:
    def _write(self, spark, tmp_path, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_matches_python_reference(self, spark):
        import numpy as np

        sf = "/root/testdata/sf0.001"
        out = REG["emb_mmr_diversify"].fn(spark, sf).collect()
        # recompute the greedy trace for one probe in pure python
        from chrono_ts_spark.operators.similarity import brute_force_topk
        from chrono_ts_spark.queries import load_all as _la
        from chrono_ts_spark.catalog import load_table as _lt
        from chrono_ts_spark.functions import vec_double
        import pyspark.sql.functions as F

        e = _lt(spark, sf, "embeddings")
        probes = e.filter(F.col("vec_id") == 0)
        cand = brute_force_topk(e, probes, k=20).select(
            "query_id", "neighbor_id", "cosine"
        )
        vecs = e.select(
            F.col("vec_id").alias("neighbor_id"),
            vec_double(F.col("embedding")).alias("nv"),
        )
        pdf = cand.join(vecs, "neighbor_id").toPandas().sort_values(
            "neighbor_id"
        ).reset_index(drop=True)
        V = np.stack(pdf["nv"].to_numpy())
        Vn = V / np.linalg.norm(V, axis=1)[:, None]
        sim = Vn @ Vn.T
        rel = pdf["cosine"].to_numpy()
        sel, avail, expect = [], list(range(len(pdf))), []
        for step in range(1, 6):
            best_i, best = None, None
            for i in avail:
                pen = max(sim[i, j] for j in sel) if sel else 0.0
                sc = 0.5 * rel[i] - 0.5 * pen
                if best is None or sc > best:
                    best_i, best = i, sc
            sel.append(best_i)
            avail.remove(best_i)
            expect.append((step, int(pdf["neighbor_id"].iloc[best_i])))
        got = sorted(
            [(r.sel_rank, r.neighbor_id) for r in out if r.query_id == 0]
        )
        assert got == expect

    def test_diversity_on_planted_clusters(self, spark, tmp_path):
        # probe near cluster A; candidates: 10 identical A-clones (high
        # rel, mutual sim 1.0) and 3 B-vectors tilted AWAY from A (so
        # sim(A,B) < rel(B) and the diversity term can actually win).
        # Plain top-5 = all A; MMR must mix B in.
        a = [1.0, -0.1] + [0.0] * 62
        b = [0.6, 0.8] + [0.0] * 62
        rows = [(0, [1.0, 0.0] + [0.0] * 62, 0)]
        for i in range(10):
            rows.append((1 + i, [float(x) for x in a], 0))
        for i in range(3):
            rows.append((50 + i, [float(x) for x in b], 1))
        sf = self._write(spark, tmp_path, rows)
        out = [r for r in REG["emb_mmr_diversify"].fn(spark, sf).collect()
               if r.query_id == 0]
        picked = {r.neighbor_id for r in out}
        assert any(n >= 50 for n in picked), picked  # a B made the cut
        assert any(1 <= n < 50 for n in picked)


class TestMarkovTransitions:
    def test_planted_chain(self, spark, tmp_path):
        # user path a->b->a->b->c : transitions ab, ba, ab, bc
        types = ["a", "b", "a", "b", "c"]
        rows = [
            (i + 1, D0 + timedelta(minutes=i), 1, t, 1.0, "{}")
            for i, t in enumerate(types)
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {
            (r.from_type, r.to_type): (r.n, r.row_total, r.p)
            for r in REG["ts_markov_transitions"].fn(spark, sf).collect()
        }
        assert got == {
            ("a", "b"): (2, 2, 1.0),
            ("b", "a"): (1, 2, 0.5),
            ("b", "c"): (1, 2, 0.5),
        }

    def test_no_cross_user_transitions(self, spark, tmp_path):
        # last event of user 1 must not chain into user 2's first
        rows = [
            (1, D0, 1, "a", 1.0, "{}"),
            (2, D0 + timedelta(minutes=1), 2, "b", 1.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        assert REG["ts_markov_transitions"].fn(spark, sf).collect() == []


class TestCDCCompact:
    def test_latest_wins_with_tiebreak(self, spark, tmp_path):
        # same-microsecond updates: event_id breaks the tie (higher wins)
        t = D0
        rows = [
            (1, t, 1, "a", 10.0, "{}"),
            (2, t, 1, "a", 20.0, "{}"),          # same ts, higher id
            (3, t + timedelta(minutes=-5), 1, "a", 99.0, "{}"),  # older
            (4, t, 1, "b", 7.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {
            (r.user_id, r.event_type): (r.last_value, r.n_versions)
            for r in REG["rel_cdc_compact"].fn(spark, sf).collect()
        }
        assert got == {(1, "a"): (20.0, 3), (1, "b"): (7.0, 1)}


class TestBigramLM:
    def _write_docs(self, spark, tmp_path, texts):
        rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_deterministic_sequence_scores_zero(self, spark, tmp_path):
        # corpus where every w1 has exactly one successor: all
        # conditionals are 1 -> mean_logprob exactly 0.
        sf = self._write_docs(spark, tmp_path, ["a b c d", "a b c d"])
        out = REG["doc_bigram_lm"].fn(spark, sf).collect()
        assert all(r.mean_logprob == 0.0 for r in out)
        assert all(r.n_bigrams == 3 for r in out)

    def test_order_sensitivity_vs_unigram(self, spark, tmp_path):
        import math

        # doc 1 = fluent repetition of "x y"; doc 2 = same tokens,
        # broken order. Same unigram profile, doc 2 must score lower.
        sf = self._write_docs(
            spark, tmp_path, ["x y x y x y x y", "x x y y x y y x"]
        )
        got = {r.doc_id: r.mean_logprob for r in
               REG["doc_bigram_lm"].fn(spark, sf).collect()}
        assert got[2] < got[1] < 0.0  # P(y|x)<1 because doc2 adds x->x


class TestEncodingFuncs:
    def test_roundtrip_always_ok(self, spark):
        out = REG["sf_encoding_funcs"].fn(spark, "/root/testdata/sf0.001").collect()
        assert all(r.roundtrip_ok == 1 for r in out)
        import base64

        r0 = out[0]
        # python reference agreement on one row
        # (hex is the UTF-8 bytes uppercased)
        orig = base64.b64decode(r0.name_b64).decode()
        assert r0.name_hex == orig.encode().hex().upper()


class TestNestedJSON:
    def test_roundtrip_vs_source(self, spark):
        import pyspark.sql.functions as F

        sf = "/root/testdata/sf0.001"
        got = {
            r.o_custkey: (r.n_orders, r.cents_total, r.n_open)
            for r in REG["io_nested_json"].fn(spark, sf).collect()
        }
        src = spark.read.parquet(f"{sf}/orders.parquet")
        exp = {
            r.o_custkey: (r.n, r.c, r.o)
            for r in src.groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("c"),
                F.sum((F.col("o_orderstatus") == "O").cast("int")).alias("o"),
            )
            .collect()
        }
        assert got == exp


class TestCalendarCoverage:
    def test_planted_gap_days(self, spark, tmp_path):
        # orders on days 0, 1, 4 of one month: calendar spans 5 days,
        # 2 uncovered.
        orders = [
            (1, 1, "O", 1.0, D0, "p"),
            (2, 1, "O", 1.0, D0 + timedelta(days=1), "p"),
            (3, 1, "O", 1.0, D0 + timedelta(days=4), "p"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        out = REG["rel_calendar_coverage"].fn(spark, str(tmp_path)).collect()
        assert sum(r.n_days for r in out) == 5
        assert sum(r.days_with_orders for r in out) == 3
        assert sum(r.days_without for r in out) == 2


class TestWeightedMedian:
    def test_planted_weights(self, spark, tmp_path):
        # prices (cents): 100 w=1, 200 w=8, 300 w=1  -> half of 10 is
        # reached inside the 200 block: lo = hi = 200.
        # Then equal split: 100 w=5, 300 w=5 -> lo=100 (2*5>=10),
        # hi=300 (first 2*cw>10) -> median 200.
        li = []
        for i, (price, w) in enumerate([(1.0, 1), (2.0, 8), (3.0, 1)]):
            li.append((1, 1, 1, i + 1, float(w), price, 0.0, 0.0, "A", "O", D0))
        for i, (price, w) in enumerate([(1.0, 5), (3.0, 5)]):
            li.append((2, 1, 1, i + 1, float(w), price, 0.0, 0.0, "B", "O", D0))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {
            r.l_returnflag: (r.lo_cents, r.hi_cents, r.weighted_median)
            for r in REG["rel_weighted_median"].fn(spark, str(tmp_path)).collect()
        }
        assert got["A"] == (200, 200, 2.0)
        assert got["B"] == (100, 300, 2.0)


class TestRandomProjection:
    def test_jl_distance_preservation(self, spark, tmp_path):
        import math
        import random

        rnd = random.Random(11)
        rows = [
            (i, [rnd.uniform(-1, 1) for _ in range(64)], 0) for i in range(12)
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        out = REG["emb_rp_project"].fn(spark, str(tmp_path)).collect()
        proj = {}
        for r in out:
            proj.setdefault(r.vec_id, {})[r.j] = r.proj
        vecs = {i: v for i, v, _ in rows}
        import itertools

        ratios = []
        for a, b in itertools.combinations(range(12), 2):
            d_full = math.dist(vecs[a], vecs[b])
            pa = [proj[a][j] for j in sorted(proj[a])]
            pb = [proj[b][j] for j in sorted(proj[b])]
            d_proj = math.dist(pa, pb)
            ratios.append(d_proj / d_full)
        mean_r = sum(ratios) / len(ratios)
        # JL with k=16: expected ratio 1, spread bounded; loose gates
        assert 0.6 < mean_r < 1.4, mean_r
        assert all(0.2 < r < 2.2 for r in ratios), ratios

    def test_linearity(self, spark, tmp_path):
        # projection is linear: proj(2v) = 2*proj(v) (up to rounding)
        v = [0.5] * 64
        rows = [(1, v, 0), (2, [2 * x for x in v], 0)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        out = REG["emb_rp_project"].fn(spark, str(tmp_path)).collect()
        p1 = {r.j: r.proj for r in out if r.vec_id == 1}
        p2 = {r.j: r.proj for r in out if r.vec_id == 2}
        for j in p1:
            assert abs(p2[j] - 2 * p1[j]) < 1e-5


class TestMatryoshkaEval:
    def test_consistency_and_prefix_dominant(self, spark, tmp_path):
        # vectors whose information lives entirely in the first 16 dims:
        # truncation must preserve the full ranking (overlap 1.0).
        import random

        rnd = random.Random(5)
        rows = []
        for i in range(30):
            head = [rnd.uniform(-1, 1) for _ in range(16)]
            rows.append((i, head + [0.0] * 48, 0))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        out = REG["emb_matryoshka_eval"].fn(spark, str(tmp_path)).collect()
        assert len(out) == 10
        for r in out:
            assert r.k_full == 5
            assert r.overlap_at_5 == 1.0


class TestRecursiveReach:
    def test_planted_chain_graph(self, spark, tmp_path):
        # co-order graph: orders {1:(1,10), 2:(10,20), 3:(20,30)} makes
        # the chain 1-10-20-30. Seed part 1: 1 hop -> {10}, 2 hops ->
        # {10, 20}; part 30 stays out of reach.
        li = []
        for ok, (a, b) in [(1, (1, 10)), (2, (10, 20)), (3, (20, 30))]:
            li.append((ok, a, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
            li.append((ok, b, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", D0))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {
            r.seed: (r.n_within_1, r.n_within_2)
            for r in REG["sql_recursive_reach"].fn(spark, str(tmp_path)).collect()
        }
        assert got == {1: (1, 2)}


class TestGrowthRates:
    def test_planted_growth_and_gap(self, spark, tmp_path):
        # months: 2024-01 $100, 2024-02 $150 (+50% MoM), 2024-04 $80
        # (gap: no 2024-03 -> MoM NULL, not vs Feb), 2025-02 $300
        # (YoY vs 2024-02 = +100%).
        orders = [
            (1, 1, "O", 100.0, datetime(2024, 1, 10), "p"),
            (2, 1, "O", 150.0, datetime(2024, 2, 10), "p"),
            (3, 1, "O", 80.0, datetime(2024, 4, 10), "p"),
            (4, 1, "O", 300.0, datetime(2025, 2, 10), "p"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {
            r.month_label: (r.mom_growth, r.yoy_growth)
            for r in REG["rel_growth_rates"].fn(spark, str(tmp_path)).collect()
        }
        assert got["2024-02"] == (0.5, None)
        assert got["2024-04"] == (None, None)  # gap month: no MoM claim
        assert got["2025-02"] == (None, 1.0)


class TestApproxPercentiles:
    def test_error_vs_exact(self, spark):
        import duckdb

        sf = "/root/testdata/sf0.01"
        out = {
            r.l_returnflag: r
            for r in REG["rel_approx_percentiles"].fn(spark, sf).collect()
        }
        con = duckdb.connect()
        exact = con.sql(
            f"""SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5) p50,
                   quantile_cont(l_extendedprice, 0.95) p95,
                   quantile_cont(l_extendedprice, 0.99) p99
                FROM '{sf}/lineitem.parquet' GROUP BY l_returnflag"""
        ).df()
        for _, e in exact.iterrows():
            a = out[e.l_returnflag]
            for col, ref in [("p50_approx", e.p50), ("p95_approx", e.p95),
                             ("p99_approx", e.p99)]:
                rel_err = abs(getattr(a, col) - ref) / ref
                assert rel_err < 0.01, (e.l_returnflag, col, rel_err)


class TestLinearAttribution:
    def test_planted_split(self, spark, tmp_path):
        # purchase of $3.00 with 3 clicks in window -> each click gets
        # exactly $1.00 (300 cents * 1e6 / 3); one click outside 24h
        # gets nothing; a purchase with no clicks vanishes.
        rows = [
            (1, D0 - timedelta(hours=25), 1, "click", 1.0, "{}"),   # too old
            (2, D0 - timedelta(hours=2), 1, "click", 1.0, "{}"),
            (3, D0 - timedelta(hours=1), 1, "click", 1.0, "{}"),
            (4, D0 - timedelta(minutes=5), 1, "click", 1.0, "{}"),
            (5, D0, 1, "purchase", 3.0, "{}"),
            (6, D0, 2, "purchase", 9.99, "{}"),                     # no clicks
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = {r.user_id: r for r in
               REG["ts_attribution_linear"].fn(spark, sf).collect()}
        assert set(out) == {1}
        r = out[1]
        assert r.n_credited_clicks == 3
        assert r.credit_fp_total == 300 * 1_000_000
        assert r.credited_revenue == 3.0

    def test_floor_division_pennies(self, spark, tmp_path):
        # $1.00 split 3 ways: 33333333 fp each, total 99999999 —
        # the floored penny is the documented convention.
        rows = [
            (1, D0 - timedelta(hours=1), 1, "click", 1.0, "{}"),
            (2, D0 - timedelta(minutes=30), 1, "click", 1.0, "{}"),
            (3, D0 - timedelta(minutes=5), 1, "click", 1.0, "{}"),
            (4, D0, 1, "purchase", 1.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_attribution_linear"].fn(spark, sf).collect()[0]
        assert r.credit_fp_total == 3 * (100 * 1_000_000 // 3)


class TestBenford:
    def test_planted_benford_exact(self, spark, tmp_path):
        # amounts with known first digits of the CENTS value:
        # 1.00->"100" d=1, 2.50->"250" d=2, 0.19->"19" d=1, 9.99->"999" d=9
        orders = [
            (1, 1, "O", 1.00, D0, "p"),
            (2, 1, "O", 2.50, D0, "p"),
            (3, 1, "O", 0.19, D0, "p"),
            (4, 1, "O", 9.99, D0, "p"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r.digit: (r.n_obs, r.observed_share, r.benford_share)
               for r in REG["rel_benford_law"].fn(spark, str(tmp_path)).collect()}
        import math

        assert got[1][:2] == (2, 0.5)
        assert got[2][:2] == (1, 0.25)
        assert got[9][:2] == (1, 0.25)
        assert got[1][2] == round(math.log10(2.0), 6)


class TestNullSafeJoin:
    def test_null_null_pairs_counted(self, spark, tmp_path):
        # nationkey%5==3 -> NULL key. Two NULL-keyed + two 1-keyed
        # customers in one segment: nullsafe = 2 pairs, eq = 1, null = 1.
        cust = [
            (1, "a", 3, 0.0, "SEG"),   # nk NULL
            (2, "b", 8, 0.0, "SEG"),   # nk NULL (8%5=3)
            (3, "c", 1, 0.0, "SEG"),   # nk 1
            (4, "d", 6, 0.0, "SEG"),   # nk 1
        ]
        spark.createDataFrame(
            cust,
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
            "c_mktsegment string",
        ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
        r = REG["rel_nullsafe_join"].fn(spark, str(tmp_path)).collect()[0]
        assert (r.n_nullsafe_pairs, r.n_eq_pairs, r.n_null_pairs) == (2, 1, 1)


class TestMovingAnnualTotal:
    def test_planted_window_and_warmup(self, spark, tmp_path):
        # 13 consecutive months of $100: month 13 MAT = 1200 (months
        # 2-13), month 12 MAT = 1200, month 1 MAT = 100 (warm-up 1).
        orders = []
        for i in range(13):
            y, mth = 2024 + (i // 12), (i % 12) + 1
            orders.append((i + 1, 1, "O", 100.0, datetime(y, mth, 5), "p"))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r.month_label: (r.months_in_window, r.mat_revenue)
               for r in REG["rel_moving_annual_total"].fn(spark, str(tmp_path)).collect()}
        assert got["2024-01"] == (1, 100.0)
        assert got["2024-12"] == (12, 1200.0)
        assert got["2025-01"] == (12, 1200.0)


class TestCentroidDrift:
    def test_planted_shift(self, spark, tmp_path):
        # label 0: even-id vectors at origin-ish, odd-id shifted by
        # exactly (3,4,0,...) -> centroid shift = 5. label 1: no shift.
        base = [0.0] * 64
        shift = [3.0, 4.0] + [0.0] * 62
        rows = []
        for i in range(10):
            v = base if i % 2 == 0 else shift
            rows.append((i, [float(x) for x in v], 0))
        for i in range(10, 20):
            rows.append((i, [1.0] * 64, 1))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        got = {r.label: r.centroid_shift_l2
               for r in REG["emb_centroid_drift"].fn(spark, tmp_path.as_posix()).collect()}
        assert got[0] == 5.0
        assert got[1] == 0.0


class TestApdex:
    def test_classification_boundaries(self, spark, tmp_path):
        # exactly-at-T (100) is satisfied; exactly-at-4T (400) is
        # tolerating; above is frustrated.
        vals = [50.0, 100.0, 100.01, 400.0, 400.01, 999.0]
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, "api", v, "{}")
                for i, v in enumerate(vals)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_apdex"].fn(spark, sf).collect()[0]
        assert (r.satisfied, r.tolerating, r.frustrated) == (2, 2, 2)
        assert r.apdex == 0.5  # (2 + 2/2) / 6


class TestForgetUser:
    def test_zero_leak_and_exact_removal(self, spark, tmp_path):
        # users 17 and 34 are in the erasure set; 1 and 2 are not.
        rows, eid = [], 0
        for u in [1, 2, 17, 34]:
            for d in range(3):
                eid += 1
                rows.append(
                    (eid, D0 + timedelta(days=d), u, "a", 1.0, "{}")
                )
        sf = _write_events(spark, tmp_path, rows)
        r = REG["gov_forget_user"].fn(spark, sf).collect()[0]
        assert r.rows_before == 12  # 4 users x 3 days
        assert r.n_forgotten_users == 2
        assert r.rows_removed == 6
        assert r.rows_after == 6
        assert r.leak_rows == 0
        assert r.n_gens_retained == 1  # pre-delete snapshot vacuumed

    def test_no_erasure_targets_is_noop(self, spark, tmp_path):
        rows = [(1, D0, 5, "a", 1.0, "{}")]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["gov_forget_user"].fn(spark, sf).collect()[0]
        assert (r.rows_removed, r.leak_rows) == (0, 0)


class TestFooterStats:
    def test_agrees_with_scan(self, spark):
        import pyspark.sql.functions as F

        sf = "/root/testdata/sf0.001"
        out = REG["io_footer_stats"].fn(spark, sf).collect()
        tbl = spark.read.parquet(f"{sf}/events.parquet")
        exp = tbl.agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("lo"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("hi"),
        ).collect()[0]
        assert sum(r.n_rows for r in out) == exp.n
        assert min(r.ts_min_s for r in out) == exp.lo
        assert max(r.ts_max_s for r in out) == exp.hi
        assert all(r.size_bytes > 0 and r.n_row_groups >= 1 for r in out)


class TestBurstiness:
    def test_metronome_vs_burst(self, spark, tmp_path):
        # metronome: equal gaps -> sigma=0 -> B = -1.
        # bursty: gaps [1s, 1s, 10000s] -> B near +... sigma>mu -> B>0.
        rows, eid = [], 0
        for i in range(5):
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=10 * i), 1, "tick", 1.0, "{}"))
        for sec in [0, 1, 2, 10002]:
            eid += 1
            rows.append((eid, D0 + timedelta(seconds=sec), 2, "burst", 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {(r.user_id, r.event_type): r.burstiness
               for r in REG["ts_burstiness"].fn(spark, sf).collect()}
        assert got[(1, "tick")] == -1.0
        # gaps [1, 1, 10000]: mu=3334, sigma=4714 -> B = 0.171 exactly
        # (small n bounds sigma/mu; the sign and the metronome's exact
        # -1 are the discriminating checks)
        assert got[(2, "burst")] == 0.171427


class TestCSVDialect:
    def test_nulls_and_quotes_survive(self, spark):
        # covered by the oracle at three SFs; here assert the NULL
        # marker really produced NULLs (not the literal string).
        out = REG["io_csv_dialect"].fn(spark, "/root/testdata/sf0.001").collect()
        assert sum(r.n_null_type for r in out) > 0
        assert all(r.name_chars > 0 for r in out)


class TestClampedBalance:
    def test_planted_clamps(self, spark, tmp_path):
        # deltas (cents): +500 (O), -800 (F -> clamps to 0), +200,
        # -200 (exactly zero: NOT clamped), -100 (clamps).
        orders = [
            (1, 1, "O", 5.0, D0, "p"),
            (2, 1, "F", 8.0, D0 + timedelta(days=1), "p"),
            (3, 1, "O", 2.0, D0 + timedelta(days=2), "p"),
            (4, 1, "F", 2.0, D0 + timedelta(days=3), "p"),
            (5, 1, "F", 1.0, D0 + timedelta(days=4), "p"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        out = sorted(
            REG["rel_clamped_balance"].fn(spark, str(tmp_path)).collect(),
            key=lambda r: r.o_orderkey,
        )
        assert [r.balance_cents for r in out] == [500, 0, 200, 0, 0]
        assert [r.clamped for r in out] == [0, 1, 0, 0, 1]


class TestJaccardThresholdCurve:
    def test_monotone_and_planted(self, spark, tmp_path):
        # pair 1-2: identical (J=1); pair 2-3: disjoint (J=0).
        t1 = "a b c d e f g h"
        t3 = "z y x w v u t s"
        rows = [(1, t1, "en", "s", 1), (2, t1, "en", "s", 1), (3, t3, "en", "s", 1)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = sorted(
            REG["doc_jaccard_threshold_curve"].fn(spark, str(tmp_path)).collect(),
            key=lambda r: r.threshold_pct,
        )
        rates = [r.dup_rate for r in out]
        assert all(r.n_pairs == 2 for r in out)
        assert rates == sorted(rates, reverse=True)  # monotone non-increasing
        assert all(r.n_dup_pairs == 1 for r in out)  # only the identical pair


class TestNotInNullTrap:
    def test_trap_counts(self, spark):
        got = {r.variant: r.n_rows
               for r in REG["rel_not_in_null_trap"].fn(spark, "/root/testdata/sf0.001").collect()}
        assert got["not_in"] == 0          # the trap: NULL in probe set
        assert got["not_exists"] == got["not_in_null_filtered"]
        assert got["not_exists"] > 0


class TestRatioToReport:
    def test_shares_sum_to_one(self, spark):
        out = REG["rel_ratio_to_report"].fn(spark, "/root/testdata/sf0.001").collect()
        total = sum(r.share_of_total for r in out)
        assert abs(total - 1.0) < 1e-4
        from collections import defaultdict

        per_region = defaultdict(float)
        for r in out:
            per_region[r.r_name] += r.share_of_region
        for v in per_region.values():
            assert abs(v - 1.0) < 1e-4


class TestIncidentMTTR:
    def test_planted_incidents(self, spark, tmp_path):
        # hours 0-1 breach (50%+ fail), hour 2 clean, hour 4 breaches:
        # two incidents, durations 2 and 1 -> mttr 1.5.
        rows, eid = [], 0
        for h, fail_cnt in [(0, 2), (1, 2), (2, 0), (4, 2)]:
            for i in range(4):
                eid += 1
                v = 400.0 if i < fail_cnt else 10.0
                rows.append((eid, D0 + timedelta(hours=h, minutes=i), 1, "api", v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_incident_mttr"].fn(spark, sf).collect()[0]
        assert (r.n_incidents, r.total_alert_hours, r.max_duration_h) == (2, 3, 2)
        assert r.mttr_hours == 1.5


class TestMixShiftChi2:
    def test_identical_mix_is_zero(self, spark, tmp_path):
        # every month has the same status mix -> chi2 exactly 0.
        orders, ok = [], 0
        for m in range(1, 4):
            for st, cnt in [("O", 4), ("F", 2)]:
                for _ in range(cnt):
                    ok += 1
                    orders.append((ok, 1, st, 1.0, datetime(2024, m, 5), "p"))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        out = REG["rel_mix_shift_chi2"].fn(spark, str(tmp_path)).collect()
        assert all(r.chi2 == 0.0 for r in out)

    def test_shifted_month_flags(self, spark, tmp_path):
        # months 1-2 are all 'O'; month 3 all 'F' -> month 3 (and the
        # others, mildly) deviate; month 3 chi2 must be the max.
        orders, ok = [], 0
        for m, st in [(1, "O"), (2, "O"), (3, "F")]:
            for _ in range(6):
                ok += 1
                orders.append((ok, 1, st, 1.0, datetime(2024, m, 5), "p"))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r.midx: r.chi2 for r in
               REG["rel_mix_shift_chi2"].fn(spark, str(tmp_path)).collect()}
        m3 = max(got)
        assert got[m3] == max(got.values()) and got[m3] > 0


class TestLSHBucketDiag:
    def test_occupancy_identities(self, spark):
        sf = "/root/testdata/sf0.001"
        out = REG["diag_lsh_buckets"].fn(spark, sf).collect()
        n_corpus = spark.read.parquet(f"{sf}/embeddings.parquet").count()
        assert len(out) == 8  # one row per hash table
        for r in out:
            assert r.n_vectors == n_corpus
            assert 1 <= r.n_buckets <= 64  # 6 planes -> at most 2^6
            assert r.max_bucket >= r.mean_bucket
            assert r.expected_candidates >= r.mean_bucket  # sz^2 weighting


class TestColumnProfile:
    def test_profile_vs_direct(self, spark):
        import pyspark.sql.functions as F

        sf = "/root/testdata/sf0.001"
        got = {r.column_name: r for r in
               REG["dq_column_profile"].fn(spark, sf).collect()}
        o = spark.read.parquet(f"{sf}/orders.parquet")
        assert got["o_custkey"].n_distinct == o.select("o_custkey").distinct().count()
        assert got["o_orderstatus"].n_distinct == 3
        top = (o.groupBy("o_orderstatus").count()
               .orderBy(F.col("count").desc(), F.col("o_orderstatus")).collect()[0])
        assert got["o_orderstatus"].top_value == top.o_orderstatus
        assert got["o_orderstatus"].top_freq == top["count"]
        assert got["o_custkey"].top_value is None


class TestSurvivalKM:
    def test_planted_curve(self, spark, tmp_path):
        # 4 series, horizon: last day = 20, hz = 18.
        # A: days 0..2 (t=2, died), B: days 0..2 (t=2, died),
        # C: days 0..5 (t=5, died), D: days 0..20 (t=20, censored).
        rows, eid = [], 0
        series = [(1, "a", [0, 1, 2]), (2, "a", [0, 2]), (3, "a", [0, 5]),
                  (4, "a", [0, 20])]
        for u, t, days in series:
            for d in days:
                eid += 1
                rows.append((eid, D0 + timedelta(days=d), u, t, 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = {r.t_days: r for r in REG["ts_survival_km"].fn(spark, sf).collect()}
        # deaths at t=2 (d=2, n=4 at risk) and t=5 (d=1, n=2)
        assert out[2].n_deaths == 2 and out[2].n_at_risk == 4
        assert out[5].n_deaths == 1 and out[5].n_at_risk == 2
        assert abs(out[2].survival - 0.5) < 1e-4          # 1 - 2/4
        assert abs(out[5].survival - 0.25) < 1e-4         # 0.5 * (1 - 1/2)

    def test_all_die_reaches_zero(self, spark, tmp_path):
        # two series both ending long before the horizon; a third keeps
        # the horizon late. The last death time has d = n -> survival 0.
        rows = [
            (1, D0, 1, "a", 1.0, "{}"),
            (2, D0 + timedelta(days=1), 1, "a", 1.0, "{}"),
            (3, D0, 2, "a", 1.0, "{}"),
            (4, D0 + timedelta(days=1), 2, "a", 1.0, "{}"),
            (5, D0 + timedelta(days=30), 3, "b", 1.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = {r.t_days: r.survival for r in
               REG["ts_survival_km"].fn(spark, sf).collect()}
        # t=1: users 1,2 die (n at risk includes the 30-day... user 3's
        # series has t=0); at t=1 d=2, n=2 -> survival 0
        assert out[1] == 0.0


class TestContrastivePairs:
    def test_planted_clusters(self, spark, tmp_path):
        # two tight clusters; anchors get same-label positives and the
        # nearest other-cluster vector as negative, margin > 0.
        rows = []
        for i in range(5):
            v = [1.0, 0.01 * i] + [0.0] * 62
            rows.append((i, [float(x) for x in v], 0))
        for i in range(5):
            v = [0.0, 1.0 + 0.01 * i] + [0.0] * 62
            rows.append((60 + i, [float(x) for x in v], 1))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        out = REG["emb_contrastive_pairs"].fn(spark, str(tmp_path)).collect()
        assert len(out) == 5  # anchors: vec_id < 50 -> cluster 0 only
        for r in out:
            assert r.a_label == 0
            assert r.pos_id < 50 and r.neg_id >= 60
            assert r.margin > 0.5


class TestDynamicOverwrite:
    def test_only_target_partition_changed(self, spark, tmp_path):
        import pyspark.sql.functions as F

        rows = [
            (1, D0, 1, "a", 10.0, "{}"),
            (2, D0, 2, "a", 20.0, "{}"),
            (3, D0 + timedelta(days=1), 1, "a", 5.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r.day: (r.n_events, r.cents_sum)
               for r in REG["io_dynamic_overwrite"].fn(spark, sf).collect()}
        # day 0 doubled (30.00 -> 60.00), day 1 untouched
        assert got["2024-03-01"] == (2, 6000)
        assert got["2024-03-02"] == (1, 500)


class TestACF:
    def test_planted_alternating_series(self, spark, tmp_path):
        # alternating high/low hourly values: acf(lag1) ~ -1, acf(lag2) ~ +1
        rows = []
        for h in range(48):
            v = 100.0 if h % 2 == 0 else 10.0
            rows.append((h + 1, D0 + timedelta(hours=h), 1, "alt", v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.lag: r.acf for r in REG["ts_acf"].fn(spark, sf).collect()}
        assert got[1] < -0.99
        assert got[2] > 0.99
        assert got[3] < -0.99

    def test_gap_awareness(self, spark, tmp_path):
        # hours 0 and 2 only: lag-1 has no pair rows; lag-2 has one pair
        # (degenerate variance -> filtered). Result must be empty, not
        # wrong.
        rows = [(1, D0, 1, "g", 1.0, "{}"),
                (2, D0 + timedelta(hours=2), 1, "g", 2.0, "{}")]
        sf = _write_events(spark, tmp_path, rows)
        assert REG["ts_acf"].fn(spark, sf).collect() == []


class TestHaarEnergy:
    def test_constant_series_zero_energy(self, spark, tmp_path):
        rows = [(h + 1, D0 + timedelta(hours=h), 1, "c", 10.0, "{}")
                for h in range(32)]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_haar_energy"].fn(spark, sf).collect()
        assert len(out) == 4
        assert all(r.energy == 0.0 for r in out)

    def test_period2_signal_concentrates_at_level1(self, spark, tmp_path):
        # period-2 alternation is pure level-1 detail: higher levels'
        # blocks contain equal +/- contributions and cancel.
        rows = []
        for h in range(32):
            v = 100.0 if h % 2 == 0 else 0.0
            rows.append((h + 1, D0 + timedelta(hours=h), 1, "p2", v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.level: r.energy for r in
               REG["ts_haar_energy"].fn(spark, sf).collect()}
        assert got[1] > 0
        assert got[2] == 0.0 and got[3] == 0.0 and got[4] == 0.0


class TestTableArgUDTF:
    def test_ordered_partition_stream(self, spark, tmp_path):
        # out-of-order arrival inside one user: the TABLE(... ORDER BY)
        # must hand rows to the UDTF in event-time order, so max_gap
        # reflects the SORTED series (2h), not the arrival order (5h).
        rows = [
            (1, D0 + timedelta(hours=5), 1, "a", 1.0, "{}"),
            (2, D0, 1, "a", 1.0, "{}"),
            (3, D0 + timedelta(hours=3), 1, "a", 1.0, "{}"),
            (4, D0, 2, "a", 1.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r.user_id: (r.n_events, r.max_gap_us, r.n_gaps)
               for r in REG["udtf_user_profile"].fn(spark, sf).collect()}
        assert got[1] == (3, 3 * 3600 * 1_000_000, 2)
        assert got[2] == (1, None, 0)


class TestLSHSCurve:
    def test_curve_properties(self, spark):
        out = REG["doc_lsh_s_curve"].fn(spark, "/root/testdata/sf0.001").collect()
        assert len(out) == 76  # 4 configs x 19 grid points
        by_cfg = {}
        for r in out:
            by_cfg.setdefault((r.bands, r.rows_per_band), []).append(
                (r.jaccard, r.p_candidate)
            )
        import math

        for (b, rr), pts in by_cfg.items():
            pts.sort()
            ps = [p for _, p in pts]
            assert all(ps[i] <= ps[i + 1] + 1e-9 for i in range(len(ps) - 1))
            # spot-check the closed form at s = 0.5
            p_exp = 1.0 - (1.0 - 0.5 ** rr) ** b
            got = dict(pts)[0.5]
            assert abs(got - round(p_exp, 6)) < 1e-6
        # more bands with fewer rows -> easier candidacy at low s
        low = {k: dict(v)[0.2] for k, v in by_cfg.items()}
        assert low[(32, 2)] > low[(4, 16)]


class TestCompressionRatio:
    def test_repetitive_vs_noise_ordering(self, spark, tmp_path):
        import random
        import zlib

        rnd = random.Random(9)
        rep = "spam " * 200
        noise = "".join(rnd.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(1000))
        rows = [(1, rep, "en", "s", len(rep)), (2, noise, "en", "s", len(noise))]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {r.doc_id: r for r in
               REG["doc_compression_ratio"].fn(spark, str(tmp_path)).collect()}
        assert got[1].compression_ratio < 0.1   # boilerplate crushes
        assert got[2].compression_ratio > 0.5   # noise barely compresses
        # byte-exact vs direct zlib
        assert got[1].compressed_bytes == len(zlib.compress(rep.encode(), 6))
        assert got[1].raw_bytes == len(rep.encode())


class TestSeasonalityStrength:
    def test_strong_vs_flat(self, spark, tmp_path):
        rows, eid = [], 0
        # type 'seasonal': pure hod pattern; type 'flat': constant.
        for h in range(24 * 7):
            eid += 1
            v = 10.0 + 50.0 * (h % 24 == 5)
            rows.append((eid, D0 + timedelta(hours=h), 1, "seasonal", v, "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "flat", 10.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.event_type: r.seasonal_strength for r in
               REG["ts_seasonality_strength"].fn(spark, sf).collect()}
        assert got["seasonal"] > 0.9
        assert "flat" not in got  # zero detrended variance -> filtered


class TestParkinsonVolatility:
    def test_constant_series_zero(self, spark, tmp_path):
        rows = [(h + 1, D0 + timedelta(hours=h), 1, "c", 10.0, "{}")
                for h in range(48)]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_parkinson_volatility"].fn(spark, sf).collect()
        assert out[0].parkinson_sigma == 0.0  # hi == lo every day

    def test_known_range(self, spark, tmp_path):
        import math

        # one day, two hours: totals 100 and 400 cents -> ln(4)^2/(4 ln2)
        rows = [
            (1, D0, 1, "r", 1.0, "{}"),
            (2, D0 + timedelta(hours=1), 1, "r", 4.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_parkinson_volatility"].fn(spark, sf).collect()[0]
        lnr = round(math.log(4.0), 6)
        exp = math.sqrt(round(lnr * lnr * 1e6) / 1e6 / (4.0 * round(math.log(2.0), 6)))
        assert r.parkinson_sigma == round(exp, 6)


class TestPeakDetection:
    def test_planted_peak_and_gap_guard(self, spark, tmp_path):
        # hours 0..6 values: 1,2,5,2,1,1,1 -> peak at h=2; shoulders are
        # min(p1,p2)=min(200,100)=100 and min(n1,n2)=min(200,100)=100,
        # so prominence = 500 - 100 = 400 cents.
        vals = [1.0, 2.0, 5.0, 2.0, 1.0, 1.0, 1.0]
        rows = [(h + 1, D0 + timedelta(hours=h), 1, "a", v, "{}")
                for h, v in enumerate(vals)]
        # a lone spike after a gap must NOT be a peak (contiguity guard)
        rows.append((99, D0 + timedelta(hours=50), 1, "a", 99.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_peak_detection"].fn(spark, sf).collect()
        assert len(out) == 1
        assert out[0].cents == 500
        assert out[0].prominence_cents == 400


class TestSegmentMigration:
    def test_planted_transitions(self, spark, tmp_path):
        # 4 customers, year 2024 spends 10/20/30/40 -> quartiles 1..4;
        # 2025: customer 1 jumps to top, others keep order.
        orders, ok = [], 0
        spends_24 = {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
        spends_25 = {1: 100.0, 2: 10.0, 3: 20.0, 4: 30.0}
        for c, v in spends_24.items():
            ok += 1
            orders.append((ok, c, "O", v, datetime(2024, 6, 1), "p"))
        for c, v in spends_25.items():
            ok += 1
            orders.append((ok, c, "O", v, datetime(2025, 6, 1), "p"))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {(r.q_from, r.q_to): r.n_customers for r in
               REG["rel_segment_migration"].fn(spark, str(tmp_path)).collect()}
        # 2025 ranks: c2=10(q1), c3=20(q2), c4=30(q3), c1=100(q4)
        assert got == {(1, 4): 1, (2, 1): 1, (3, 2): 1, (4, 3): 1}


class TestAlphaSweep:
    def test_constant_series_zero_sse(self, spark, tmp_path):
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, "a", 5.0, "{}")
                for i in range(10)]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_ema_alpha_sweep"].fn(spark, sf).collect()
        assert len(out) == 9
        assert all(r.sse == 0.0 for r in out)
        # tie on SSE -> smallest alpha flagged best (deterministic)
        best = [r.alpha for r in out if r.is_best]
        assert best == [0.1]

    def test_trend_prefers_high_alpha(self, spark, tmp_path):
        # strong linear trend: tracking fast (high alpha) wins.
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, "a", float(i * 10), "{}")
                for i in range(50)]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_ema_alpha_sweep"].fn(spark, sf).collect()
        best = [r.alpha for r in out if r.is_best][0]
        assert best == 0.9


class TestCharEntropy:
    def test_extremes(self, spark, tmp_path):
        import math

        rows = [
            (1, "aaaaaaaaaa", "en", "s", 10),          # entropy 0
            (2, "abababab", "en", "s", 8),             # exactly ln(2)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {r.doc_id: r.char_entropy for r in
               REG["doc_char_entropy"].fn(spark, str(tmp_path)).collect()}
        assert got[1] == 0.0
        assert abs(got[2] - math.log(2)) < 1e-6


class TestShipLatency:
    def test_planted_percentiles(self, spark, tmp_path):
        # latencies (days): [1,1,1,2,10] -> p50=1 (cum 3/5), p95=10,
        # mean=3.0
        li, orders = [], [(k, 1, "O", 1.0, D0, "1-URGENT") for k in range(1, 6)]
        for ok, lat in [(1, 1), (2, 1), (3, 1), (4, 2), (5, 10)]:
            li.append((ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                       D0 + timedelta(days=lat)))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        r = REG["rel_ship_latency"].fn(spark, str(tmp_path)).collect()[0]
        assert (r.n, r.p50_days, r.p95_days) == (5, 1, 10)
        assert r.mean_days == 3.0


class TestTryFuncs:
    def test_try_semantics(self, spark):
        out = REG["sf_try_funcs"].fn(spark, "/root/testdata/sf0.001").collect()
        assert all(r.name_as_int is None for r in out)      # names not numeric
        assert all(r.name_not_numeric == 1 for r in out)
        assert all(r.size_roundtrip is not None for r in out)
        # size == 5 rows must yield NULL (divide by zero absorbed)
        fives = [r for r in out if r.size_roundtrip == 5]
        assert all(r.price_per_adjusted is None for r in fives)


class TestMissingHours:
    def test_planted_gaps(self, spark, tmp_path):
        # hours 0,1,2, 5, 9: span 10, observed 5, missing 5, longest
        # gap = 3 (hours 6,7,8).
        rows = [(i + 1, D0 + timedelta(hours=h), 1, "a", 1.0, "{}")
                for i, h in enumerate([0, 1, 2, 5, 9])]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_missing_hours"].fn(spark, sf).collect()[0]
        assert (r.span_hours, r.observed_hours, r.missing_hours) == (10, 5, 5)
        assert r.longest_gap_hours == 3
        assert r.coverage == 0.5

    def test_complete_series(self, spark, tmp_path):
        rows = [(h + 1, D0 + timedelta(hours=h), 1, "a", 1.0, "{}")
                for h in range(6)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_missing_hours"].fn(spark, sf).collect()[0]
        assert (r.missing_hours, r.longest_gap_hours, r.coverage) == (0, 0, 1.0)


class TestConcentration:
    def _write(self, spark, tmp_path, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_aligned_vs_opposed(self, spark, tmp_path):
        e1 = [1.0] + [0.0] * 63
        e2 = [-1.0] + [0.0] * 63
        rows = ([(i, e1, 0) for i in range(4)]            # all aligned -> R=1
                + [(10, e1, 1), (11, e2, 1)])             # opposed -> R=0
        sf = self._write(spark, tmp_path, rows)
        got = {r.label: r.mean_resultant_length for r in
               REG["emb_concentration"].fn(spark, sf).collect()}
        assert got[0] == 1.0
        assert got[1] == 0.0

    def test_scale_invariance(self, spark, tmp_path):
        # magnitudes must not matter: unit-vector normalization first.
        e1 = [3.0, 4.0] + [0.0] * 62
        e2 = [0.3, 0.4] + [0.0] * 62
        rows = [(0, e1, 0), (1, e2, 0)]
        sf = self._write(spark, tmp_path, rows)
        r = REG["emb_concentration"].fn(spark, sf).collect()[0]
        assert abs(r.mean_resultant_length - 1.0) < 1e-6


class TestHHI:
    def test_monopoly_and_uniform(self, spark, tmp_path):
        # region R1: one nation holds everything -> HHI 1.0.
        # region R2: two equal nations -> HHI 0.5 == its uniform floor.
        region = [(1, "R1"), (2, "R2")]
        nation = [(1, "N1", 1), (2, "N2", 2), (3, "N3", 2)]
        cust = [(1, "c", 1, 0.0, "S"), (2, "c", 2, 0.0, "S"), (3, "c", 3, 0.0, "S")]
        orders = [(1, 1, "O", 0.0, D0, "p"), (2, 2, "O", 0.0, D0, "p"),
                  (3, 3, "O", 0.0, D0, "p")]
        li = [
            (1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", D0),
            (2, 1, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", D0),
            (3, 1, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", D0),
        ]
        spark.createDataFrame(region, "r_regionkey int, r_name string").write.mode(
            "overwrite").parquet(str(tmp_path / "region.parquet"))
        spark.createDataFrame(
            nation, "n_nationkey int, n_name string, n_regionkey int"
        ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
        spark.createDataFrame(
            cust,
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
            "c_mktsegment string",
        ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {r.r_name: (r.hhi, r.hhi_uniform_floor) for r in
               REG["rel_hhi_concentration"].fn(spark, str(tmp_path)).collect()}
        assert got["R1"] == (1.0, 1.0)       # single member
        assert got["R2"] == (0.5, 0.5)       # perfectly even pair


class TestDiscountElasticity:
    def test_planted_slope(self, spark, tmp_path):
        # brand A: qty = 5 + 2*discount_pts exactly -> slope 2, base 5.
        li, pt = [], [(1, "p", "Brand#A", "t", 1, 1.0)]
        for i, dpt in enumerate([0, 1, 2, 3]):
            li.append((i + 1, 1, 1, 1, float(5 + 2 * dpt), 1.0,
                       dpt / 100.0, 0.0, "N", "O", D0))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            pt,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
        r = REG["rel_discount_elasticity"].fn(spark, str(tmp_path)).collect()[0]
        assert r.qty_per_discount_pt == 2.0
        assert r.base_qty == 5.0


class TestLjungBox:
    def test_structured_beats_flat(self, spark, tmp_path):
        import random

        rnd = random.Random(13)
        rows, eid = [], 0
        for h in range(24 * 5):
            # 'alt' alternates (max autocorrelation), 'noise' is random
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "alt",
                         100.0 if h % 2 == 0 else 10.0, "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "noise",
                         rnd.uniform(1, 100), "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.event_type: r for r in
               REG["ts_ljung_box"].fn(spark, sf).collect()}
        assert got["alt"].n_lags == 12
        assert got["alt"].q_stat > 10 * got["noise"].q_stat
        # chi2(12) 95% critical value ~21: structure must scream
        assert got["alt"].q_stat > 100


class TestLIX:
    def test_planted_formula(self, spark, tmp_path):
        # 2 sentences, 8 words, 2 long (>6 letters):
        # LIX = 8/2 + 100*2/8 = 4 + 25 = 29.
        t = "short words here now. wonderful magnificent go on."
        rows = [(1, t, "en", "s", len(t))]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        r = REG["doc_lix_readability"].fn(spark, str(tmp_path)).collect()[0]
        assert (r.n_words, r.n_long, r.n_sents) == (8, 2, 2)
        assert r.lix == 29.0

    def test_unpunctuated_is_one_sentence(self, spark, tmp_path):
        t = "no punctuation at all just words"
        rows = [(1, t, "en", "s", len(t))]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        r = REG["doc_lix_readability"].fn(spark, str(tmp_path)).collect()[0]
        assert r.n_sents == 1


class TestANOVA:
    def test_separated_vs_merged_groups(self, spark, tmp_path):
        # groups at 10 and 1000 with tiny within-noise: F explodes;
        # same data labeled as ONE group -> filtered (k=1 on both).
        rows, eid = [], 0
        for i in range(20):
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "lo",
                         10.0 + (i % 3) * 0.01, "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "hi",
                         1000.0 + (i % 3) * 0.01, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_anova_types"].fn(spark, sf).collect()[0]
        assert r.n_groups == 2 and r.n_obs == 40
        assert r.f_stat > 1e5
        assert r.ms_between > r.ms_within


class TestPoissonBootstrap:
    def test_interval_brackets_mean_and_shrinks(self, spark):
        sf = "/root/testdata/sf0.01"
        out = {r.event_type: r for r in
               REG["ts_poisson_bootstrap_ci"].fn(spark, sf).collect()}
        for r in out.values():
            assert r.ci_lo <= r.mean_value <= r.ci_hi
            width = r.ci_hi - r.ci_lo
            # ~2000 samples/type: the 90% CI must be tight but nonzero
            assert 0 < width < r.mean_value * 0.5

    def test_deterministic(self, spark):
        sf = "/root/testdata/sf0.001"
        a = sorted(map(tuple, REG["ts_poisson_bootstrap_ci"].fn(spark, sf).collect()))
        b = sorted(map(tuple, REG["ts_poisson_bootstrap_ci"].fn(spark, sf).collect()))
        assert a == b


class TestMaxDrawdown:
    def test_order_sensitivity(self, spark, tmp_path):
        # same multiset of values, opposite orders: rising series has
        # zero drawdown, falling has the full range.
        rows = []
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
            rows.append((i + 1, D0 + timedelta(minutes=i), 1, "up", v, "{}"))
        for i, v in enumerate([4.0, 3.0, 2.0, 1.0]):
            rows.append((10 + i, D0 + timedelta(minutes=i), 2, "down", v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.user_id: r for r in
               REG["ts_max_drawdown"].fn(spark, sf).collect()}
        assert got[1].max_drawdown_cents == 0
        assert got[2].max_drawdown_cents == 300
        assert got[2].max_drawdown_frac == 0.75


class TestHurst:
    def test_trend_vs_alternating(self, spark, tmp_path):
        rows, eid = [], 0
        for h in range(256):
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "trend",
                         float(h), "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "alt",
                         100.0 if h % 2 == 0 else 10.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.event_type: r.hurst for r in
               REG["ts_hurst_exponent"].fn(spark, sf).collect()}
        assert got["trend"] > 0.85          # persistent
        assert got["alt"] < 0.35            # anti-persistent
        assert got["trend"] > got["alt"]


class TestEntropyRate:
    def test_deterministic_chain_zero(self, spark, tmp_path):
        # a -> b -> a -> b ...: every conditional is 1 -> rate 0.
        rows = [(i + 1, D0 + timedelta(minutes=i), 1,
                 "a" if i % 2 == 0 else "b", 1.0, "{}") for i in range(20)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_entropy_rate"].fn(spark, sf).collect()[0]
        assert r.entropy_rate_nats == 0.0
        assert r.n_states == 2

    def test_uniform_chain_ln2(self, spark, tmp_path):
        import math

        # alternating blocks a,a,b,b,... gives P(a|a)=P(b|a)=...; build
        # a sequence where each state goes to either state equally:
        # a b a a b b a b -> approximate; use exact pattern a a b a b b
        # repeated so each row has 50/50. Simpler: a,b,b,a repeated:
        # transitions ab,bb,ba,aa... each from-state sees one of each.
        seq = ["a", "b", "b", "a"] * 10 + ["a"]
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, t, 1.0, "{}")
                for i, t in enumerate(seq)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_entropy_rate"].fn(spark, sf).collect()[0]
        assert abs(r.entropy_rate_nats - math.log(2)) < 0.01


class TestKnnEval:
    def _write(self, spark, tmp_path, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_tight_clusters_perfect(self, spark, tmp_path):
        import random

        rnd = random.Random(21)
        rows = []
        for lbl in range(2):
            base = [0.0] * 64
            base[lbl * 10] = 5.0
            for i in range(10):
                v = [x + rnd.gauss(0, 0.01) for x in base]
                rows.append((lbl * 10 + i, [float(x) for x in v], lbl))
        sf = self._write(spark, tmp_path, rows)
        out = REG["emb_knn_eval"].fn(spark, sf).collect()
        assert all(r.loo_accuracy == 1.0 for r in out)

    def test_mislabeled_point_caught(self, spark, tmp_path):
        # one vector sits inside cluster 0 but carries label 1: its
        # neighbors vote 0, so label-1 accuracy drops below 1.
        rows = [(i, [5.0] + [0.0] * 63, 0) for i in range(8)]
        rows.append((8, [5.0] + [0.0] * 63, 1))          # mislabeled
        rows += [(20 + i, [0.0, 5.0] + [0.0] * 62, 1) for i in range(8)]
        sf = self._write(spark, tmp_path, rows)
        got = {r.label: r for r in REG["emb_knn_eval"].fn(spark, sf).collect()}
        assert got[0].loo_accuracy == 1.0
        assert got[1].n_correct == got[1].n_anchors - 1


class TestQuantileTable:
    def test_planted_order_statistics(self, spark, tmp_path):
        # 20 values 1..20 dollars: the q-th lower order statistic at
        # q20/20 is exactly value q20 (rank*20 >= q20*20 <=> rank>=q20).
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, "a", float(i + 1), "{}")
                for i in range(20)]
        sf = _write_events(spark, tmp_path, rows)
        got = {r.q: r.quantile_cents for r in
               REG["ts_quantile_table"].fn(spark, sf).collect()}
        assert len(got) == 19
        for q20 in range(1, 20):
            assert got[round(q20 / 20.0, 2)] == q20 * 100

    def test_monotone(self, spark):
        out = REG["ts_quantile_table"].fn(spark, "/root/testdata/sf0.001").collect()
        by_type = {}
        for r in out:
            by_type.setdefault(r.event_type, []).append((r.q, r.quantile_cents))
        for pts in by_type.values():
            pts.sort()
            vals = [v for _, v in pts]
            assert vals == sorted(vals)


class TestVocabRichness:
    def test_planted_profiles(self, spark, tmp_path):
        # doc 1: repetitive (TTR low); doc 2: all-unique words that
        # appear nowhere else (hapax_share 1.0).
        t1 = "spam spam spam spam spam ham"
        t2 = "zyx wvu tsr qpo nml"
        rows = [(1, t1, "en", "s", len(t1)), (2, t2, "en", "s", len(t2))]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {r.doc_id: r for r in
               REG["doc_vocab_richness"].fn(spark, str(tmp_path)).collect()}
        assert got[1].n_tokens == 6 and got[1].n_types == 2
        assert got[1].ttr == round(2 / 6, 6)
        assert got[1].n_corpus_hapax == 1          # only 'ham'
        assert got[2].hapax_share == 1.0


class TestPriceVolumeMix:
    def test_planted_bridge(self, spark, tmp_path):
        # brand A: prior year q=10 rev=$100 (p=10); current q=15 rev=$180
        # (p=12). volume = +5*10 = $50; price = 180-100-50 = $30.
        li, orders, pt = [], [], [(1, "p", "Brand#A", "t", 1, 1.0)]
        orders.append((1, 1, "O", 0.0, datetime(2024, 6, 1), "p"))
        orders.append((2, 1, "O", 0.0, datetime(2025, 6, 1), "p"))
        li.append((1, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", D0))
        li.append((2, 1, 1, 1, 15.0, 180.0, 0.0, 0.0, "N", "O", D0))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        spark.createDataFrame(
            pt,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
        r = REG["rel_price_volume_mix"].fn(spark, str(tmp_path)).collect()[0]
        assert (r.q1, r.q2) == (10, 15)
        assert r.delta_rev == 80.0
        assert r.volume_effect == 50.0
        assert r.price_effect == 30.0
        assert abs((r.volume_effect + r.price_effect) - r.delta_rev) < 0.02


class TestSTLAnomaly:
    def test_offschedule_spike_flagged(self, spark, tmp_path):
        # a strong daily pattern with ONE spike at an off-peak hour:
        # the 9am-style peak hours must NOT be anomalies; the 3am spike
        # must be flagged +1.
        rows, eid = [], 0
        spike_h = 24 * 4 + 3      # day 4, 03:00
        for h in range(24 * 8):
            base = 100.0 if h % 24 == 9 else 10.0
            v = 100.0 if h == spike_h else base
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "a", v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_stl_anomaly"].fn(spark, sf).collect()
        flagged = {r.h - (r.h // 24) * 24 for r in out}  # hods flagged
        anomaly_rows = [r for r in out if r.anomaly == 1]
        assert anomaly_rows, out
        # the spike hour is among the positive anomalies
        base_h = min(r.h for r in out) - (min(r.h for r in out) % 24)
        assert any(r.h % 24 == 3 for r in anomaly_rows)
        # no 9am row flagged positive (it's the EXPECTED peak)
        assert not any(r.h % 24 == 9 and r.anomaly == 1 for r in out)


class TestQuantizationError:
    def test_error_bound(self, spark):
        # floor quantization: per-component error < step = max_abs/127.
        r = REG["emb_quantization_error"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()[0]
        assert r.n_vectors == 500
        assert 0 < r.mean_abs_err < 0.05
        assert r.worst_vector_mae >= r.mean_abs_err

    def test_planted_exact(self, spark, tmp_path):
        # vector [1, 0.5]: scale 127; q(1)=127 exact; q(0.5)=63/127 ->
        # err = 0.5 - 63/127.
        rows = [(1, [1.0, 0.5] + [0.0] * 62, 0)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        r = REG["emb_quantization_error"].fn(spark, str(tmp_path)).collect()[0]
        exp = round(round(0.5 - 63.0 / 127.0, 9), 9) / 64
        assert abs(r.mean_abs_err - round(exp, 6)) < 2e-6


class TestRLEStats:
    def test_planted_runs(self, spark, tmp_path):
        # values 5,5,5,7,7,5: runs = 3 -> ratio 2.0
        vals = [5.0, 5.0, 5.0, 7.0, 7.0, 5.0]
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, "a", v, "{}")
                for i, v in enumerate(vals)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_rle_stats"].fn(spark, sf).collect()[0]
        assert (r.n_points, r.n_runs) == (6, 3)
        assert r.rle_ratio == 2.0

    def test_constant_series_max_ratio(self, spark, tmp_path):
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, "a", 9.0, "{}")
                for i in range(8)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_rle_stats"].fn(spark, sf).collect()[0]
        assert (r.n_runs, r.rle_ratio) == (1, 8.0)


class TestValueShape:
    def test_symmetric_vs_skewed(self, spark, tmp_path):
        rows, eid = [], 0
        # symmetric: 1,2,3 repeated -> skew 0; skewed: many small + one
        # huge -> strong positive skew and kurtosis.
        for i in range(30):
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "sym",
                         float(1 + i % 3), "{}"))
        for i in range(29):
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "skew", 1.0, "{}"))
        eid += 1
        rows.append((eid, D0 + timedelta(minutes=eid), 1, "skew", 1000.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.event_type: r for r in
               REG["ts_value_shape"].fn(spark, sf).collect()}
        assert got["sym"].skewness == 0.0
        assert got["skew"].skewness > 4
        assert got["skew"].excess_kurtosis > 15


class TestBasketHistogram:
    def test_shares_sum_and_bound(self, spark):
        out = REG["rel_basket_size_histogram"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert abs(sum(r.share for r in out) - 1.0) < 1e-4
        assert all(r.basket_size >= 1 for r in out)


class TestAsciiRatio:
    def test_planted_non_ascii(self, spark, tmp_path):
        rows = [
            (1, "plain ascii text", "en", "s", 16),
            (2, "café über naïve", "en", "s", 15),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {r.doc_id: r for r in
               REG["doc_ascii_ratio"].fn(spark, str(tmp_path)).collect()}
        assert got[1].ascii_ratio == 1.0 and got[1].n_non_ascii == 0
        assert got[2].n_non_ascii == 3


class TestRangeSearch:
    def test_planted_threshold(self, spark, tmp_path):
        # probe 0; vec 20 at cosine 1, vec 21 orthogonal -> only 20 hits.
        rows = [
            (0, [1.0] + [0.0] * 63, 0),
            (20, [2.0] + [0.0] * 63, 0),
            (21, [0.0, 1.0] + [0.0] * 62, 0),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        out = [(r.query_id, r.neighbor_id, r.cosine) for r in
               REG["emb_range_search"].fn(spark, str(tmp_path)).collect()]
        assert (0, 20, 1.0) in out
        assert not any(n == 21 for _, n, _ in out)


class TestCroston:
    def test_matches_python_reference(self, spark, tmp_path):
        # user 1 purchases on days 0, 2, 3 with sizes $1, $2, $4.
        rows = [
            (1, D0, 1, "purchase", 1.0, "{}"),
            (2, D0 + timedelta(days=2), 1, "purchase", 2.0, "{}"),
            (3, D0 + timedelta(days=3), 1, "purchase", 4.0, "{}"),
            (4, D0, 1, "click", 9.0, "{}"),   # non-demand noise ignored
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = sorted(REG["ts_croston"].fn(spark, sf).collect(),
                     key=lambda r: r.day)
        z, p = 100.0, 1.0
        expect = [(z, p)]
        for q, gap in [(200.0, 2.0), (400.0, 1.0)]:
            z = 0.1 * q + 0.9 * z
            p = 0.1 * gap + 0.9 * p
            expect.append((z, p))
        for r, (ez, ep) in zip(out, expect):
            assert r.smooth_size == ez          # bit-exact
            assert r.smooth_interval == ep
            assert r.forecast_per_day == round(ez / ep, 6)


class TestSortedWrite:
    def test_sorted_layout_tighter(self, spark):
        out = {r.layout: r for r in
               REG["io_sorted_write"].fn(spark, "/root/testdata/sf0.01").collect()}
        assert out["sorted"].n_row_groups >= 1
        # the whole point: sorted row groups span far less time
        assert out["sorted"].mean_ts_span_s < out["unsorted"].mean_ts_span_s / 2


class TestExpectedShortfall:
    def test_planted_tail(self, spark, tmp_path):
        # 20 values 1..20 dollars: p95 (ck*20 >= 19n) = 19; tail =
        # {19, 20} -> ES = 19.50.
        rows = [(i + 1, D0 + timedelta(minutes=i), 1, "a", float(i + 1), "{}")
                for i in range(20)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_expected_shortfall"].fn(spark, sf).collect()[0]
        assert r.var95_cents == 1900
        assert r.n_tail == 2
        assert r.expected_shortfall == 19.5
        # ES must always be >= VaR
        assert r.expected_shortfall * 100 >= r.var95_cents


class TestTimestampStats:
    def test_sink_timestamps_carry_stats(self, spark, tmp_path):
        # RUNTIME_CONFS forces TIMESTAMP_MICROS: a timestamp column
        # written by any engine sink must carry min/max footer stats
        # (INT96, Spark's default, writes none — pruning would be lost).
        import pyarrow.parquet as pq
        import glob
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(1, D0), (2, D0 + timedelta(hours=5))], "id long, ts timestamp"
        )
        out = str(tmp_path / "ts_stats.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        fp = glob.glob(f"{out}/*.parquet")[0]
        md = pq.ParquetFile(fp).metadata
        names = md.schema.to_arrow_schema().names
        st = md.row_group(0).column(names.index("ts")).statistics
        assert st is not None and st.has_min_max
        assert st.min.hour == 0 and st.max.hour == 5


class TestSnapshotDiff:
    def test_accounting_identity(self, spark):
        r = REG["gov_snapshot_diff"].fn(spark, "/root/testdata/sf0.001").collect()[0]
        # batch 2 is a superset reapplication: nothing deleted; the
        # second half of events ADDS new (user, day) keys and UPDATES
        # counts on existing ones.
        assert r.deleted == 0
        assert r.added >= 0 and r.updated > 0
        assert r.added + r.updated + r.unchanged > 0


class TestLOOEncoding:
    def test_planted_exclusion(self, spark, tmp_path):
        # flag A: prices $1, $2, $4 -> row 1's LOO mean = (200+400)/2 =
        # 300 cents -> 300*1e4 exactly; singleton flag B drops.
        li = [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "A", "O", D0),
            (2, 1, 1, 1, 1.0, 2.0, 0.0, 0.0, "A", "O", D0),
            (3, 1, 1, 1, 1.0, 4.0, 0.0, 0.0, "A", "O", D0),
            (4, 1, 1, 1, 1.0, 9.0, 0.0, 0.0, "B", "O", D0),
        ]
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        out = {r.l_orderkey: r.loo_mean_e4 for r in
               REG["rel_loo_target_encoding"].fn(spark, str(tmp_path)).collect()}
        assert out[1] == 300 * 10000
        assert out[2] == 250 * 10000
        assert out[3] == 150 * 10000
        assert 4 not in out  # singleton category dropped


class TestNaiveBaselines:
    def test_planted_errors_and_gap_correctness(self, spark, tmp_path):
        # 48 hours alternating 10/20 dollars: naive MAE = 10.0 exactly;
        # seasonal-naive (24h, even period) MAE = 0.0.
        rows = [(h + 1, D0 + timedelta(hours=h), 1, "alt",
                 10.0 if h % 2 == 0 else 20.0, "{}") for h in range(48)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_naive_baselines"].fn(spark, sf).collect()[0]
        assert r.naive_mae == 10.0
        assert r.seasonal_naive_mae == 0.0
        assert r.n_naive == 47 and r.n_seasonal == 24


class TestPrefixDupGroups:
    def test_planted_shared_opening(self, spark, tmp_path):
        opening = "x" * 64
        rows = [
            (1, opening + " unique tail one", "en", "s", 80),
            (2, opening + " totally different end", "en", "s", 86),
            (3, "y" * 64 + " alone", "en", "s", 70),
            (4, "short", "en", "s", 5),          # < 64 chars: excluded
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = REG["doc_prefix_dup_groups"].fn(spark, str(tmp_path)).collect()
        assert len(out) == 1
        assert (out[0].n_docs, out[0].exemplar_doc) == (2, 1)


class TestSoundexBlocking:
    def test_published_vectors_and_blocks(self, spark, tmp_path):
        # published Soundex: Robert=R163, Rupert=R163, Smith=S530,
        # Smyth=S530, Ashcraft=A261.
        pt = [
            (1, "Robert thing", "B", "t", 1, 1.0),
            (2, "Rupert thing", "B", "t", 1, 1.0),
            (3, "Smith thing", "B", "t", 1, 1.0),
            (4, "Smyth thing", "B", "t", 1, 1.0),
            (5, "Ashcraft thing", "B", "t", 1, 1.0),
        ]
        spark.createDataFrame(
            pt,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
        got = {r.sdx: (r.n_parts, r.n_words) for r in
               REG["rel_soundex_blocking"].fn(spark, str(tmp_path)).collect()}
        assert got["R163"] == (2, 2)   # Robert + Rupert sound-alike block
        assert got["S530"] == (2, 2)   # Smith + Smyth
        assert got["A261"] == (1, 1)

    def test_sql_soundex_fold_matches_spark_builtin(self, spark):
        """The oracle IMPLEMENTS soundex (DuckDB ships none) as a
        list_reduce char fold. Pin it against Spark's JVM builtin on
        the adversarial vectors: H/W-bridge collapses (Ashcraft,
        CHC/CWC), vowel resets (CAHC, Tymczak), leading double-codes
        (Pfister), 4-char truncation (Lukasiewicz), and short names."""
        import duckdb

        from pyspark.sql import functions as F

        words = [
            "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
            "Pfister", "Honeyman", "Smith", "Smyth", "Washington",
            "Lee", "Gutierrez", "Wu", "Aaa", "Hhh", "CAHC", "CHC",
            "CWC", "HW", "AWH", "Lukasiewicz", "Lloyd", "Wheaton",
            "Burroughs", "Burrows", "Schafer", "Sgler", "Swhgler",
            "goldenrod", "lavender", "A",
        ]
        expected = {
            r.w: r.s
            for r in spark.createDataFrame([(w,) for w in words], ["w"])
            .select("w", F.soundex("w").alias("s"))
            .collect()
        }
        con = duckdb.connect()
        vals = ", ".join(f"('{w}')" for w in words)
        con.execute(
            f"CREATE VIEW part AS SELECT * FROM (VALUES {vals}) t(p_name)"
        )
        got = dict(
            con.execute(
                "SELECT words, sdx FROM (" +
                REG["rel_soundex_blocking"].oracle +
                ")"
            ).fetchall()
        )
        # oracle groups by code; invert via the words column
        inv = {}
        for wlist, sdx in got.items():
            for w in wlist.split(","):
                inv[w] = sdx
        assert inv == expected


class TestDupClusterSizes:
    def test_identity_with_components(self, spark):
        sf = "/root/testdata/sf0.001"
        sizes = REG["doc_dup_cluster_sizes"].fn(spark, sf).collect()
        cc_rows = REG["doc_dup_clusters"].fn(spark, sf).count()
        assert sum(r.n_docs for r in sizes) == cc_rows
        assert all(r.cluster_size >= 2 or r.n_clusters >= 0 for r in sizes)


class TestMannWhitney:
    def test_planted_separation_and_ties(self, spark, tmp_path):
        # errors all 30, clicks all 10 (complete separation with ties
        # inside groups): AUC = 1.0, rank_biserial = 1.0.
        rows, eid = [], 0
        for _ in range(4):
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "error", 30.0, "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "click", 10.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_mann_whitney"].fn(spark, sf).collect()[0]
        assert (r.n_error, r.n_click) == (4, 4)
        assert r.auc == 1.0 and r.rank_biserial == 1.0

    def test_identical_distributions_half(self, spark, tmp_path):
        # identical values across groups: all ties -> AUC exactly 0.5.
        rows, eid = [], 0
        for _ in range(5):
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "error", 7.0, "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "click", 7.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_mann_whitney"].fn(spark, sf).collect()[0]
        assert r.auc == 0.5 and r.rank_biserial == 0.0


class TestRecordCounts:
    def test_monotone_vs_front_loaded(self, spark, tmp_path):
        rows, eid = [], 0
        for i in range(10):            # strictly rising: every event a record
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 1, "up",
                         float(i + 1), "{}"))
        for i in range(10):            # strictly falling: only the first
            eid += 1
            rows.append((eid, D0 + timedelta(minutes=eid), 2, "down",
                         float(100 - i), "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.user_id: r.n_records for r in
               REG["ts_record_counts"].fn(spark, sf).collect()}
        assert got[1] == 10
        assert got[2] == 1


class TestSpearman:
    def test_monotone_nonlinear_is_one(self, spark, tmp_path):
        # y = x^3-ish via hourly sums: two series monotonically related
        # but nonlinear -> Spearman exactly 1 (Pearson would be < 1).
        rows, eid = [], 0
        for h in range(24):
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "a",
                         float(h + 1), "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "b",
                         float((h + 1) ** 2) / 10.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_spearman_pairs"].fn(spark, sf).collect()[0]
        assert r.spearman_rho == 1.0

    def test_reversed_is_minus_one(self, spark, tmp_path):
        rows, eid = [], 0
        for h in range(24):
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "a",
                         float(h + 1), "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "b",
                         float(100 - h), "{}"))
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_spearman_pairs"].fn(spark, sf).collect()[0]
        assert r.spearman_rho == -1.0


class TestCircularTime:
    def test_midnight_straddle(self, spark, tmp_path):
        # events at 23:00 and 01:00: circular mean = 0.0 (midnight),
        # where the arithmetic mean of hours would say noon.
        rows = [
            (1, D0 + timedelta(hours=23), 1, "a", 1.0, "{}"),
            (2, D0 + timedelta(hours=25), 1, "a", 1.0, "{}"),  # next day 01:00
        ]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_time_of_day_circular"].fn(spark, sf).collect()[0]
        assert r.mean_hour in (0.0, 24.0) or abs(r.mean_hour - 24.0) < 0.01 \
            or abs(r.mean_hour) < 0.01
        assert r.resultant_length > 0.9  # tightly concentrated

    def test_uniform_spread_low_r(self, spark, tmp_path):
        rows = [(h + 1, D0 + timedelta(hours=h), 1, "a", 1.0, "{}")
                for h in range(24)]
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_time_of_day_circular"].fn(spark, sf).collect()[0]
        assert r.resultant_length < 0.01  # evenly spread around the clock


class TestDuplicatePayments:
    def test_planted_double_submission(self, spark, tmp_path):
        orders = [
            (1, 1, "O", 49.99, D0, "p"),
            (2, 1, "O", 49.99, D0 + timedelta(days=3), "p"),   # double!
            (3, 1, "O", 20.00, D0 + timedelta(days=30), "p"),
            (4, 2, "O", 49.99, D0, "p"),                        # other payer
            (5, 2, "O", 10.00, D0 + timedelta(days=1), "p"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r.o_custkey: r for r in
               REG["rel_duplicate_payments"].fn(spark, str(tmp_path)).collect()}
        assert got[1].n_same_amount_pairs == 1
        assert got[1].min_days_apart == 3
        assert got[1].flag_review == 1
        assert got[2].n_same_amount_pairs == 0
        assert got[2].flag_review == 0


class TestVarianceRatio:
    def test_trend_above_one_alternation_below(self, spark, tmp_path):
        rows, eid = [], 0
        for h in range(200):
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "trend",
                         float(h + 1), "{}"))
            eid += 1
            rows.append((eid, D0 + timedelta(hours=h), 1, "alt",
                         100.0 if h % 2 == 0 else 10.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.event_type: r.variance_ratio for r in
               REG["ts_variance_ratio"].fn(spark, sf).collect()}
        # pure trend has zero 1h diff variance -> filtered out
        assert "trend" not in got
        # alternation: 4h diffs are ~0 while 1h diffs are huge -> VR ~ 0
        assert got["alt"] < 0.05


class TestLabelMedoid:
    def test_center_point_recovered(self, spark, tmp_path):
        # points on a line: 0, 1, 2, 3, 10 -> medoid is 2 (minimizes
        # total distance), NOT the centroid (3.2, which is no member).
        rows = [(i, [float(v)] + [0.0] * 63, 0)
                for i, v in enumerate([0.0, 1.0, 2.0, 3.0, 10.0])]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        r = REG["emb_label_medoid"].fn(spark, str(tmp_path)).collect()[0]
        assert r.medoid_id == 2
        assert r.n_members == 5
        # total dists from 2: 2+1+0+1+8 = 12 -> mean over 4 others = 3
        assert r.mean_dist_to_members == 3.0


class TestNewVsReturning:
    def test_planted_split(self, spark, tmp_path):
        orders = [
            (1, 1, "O", 10.0, datetime(2024, 1, 5), "p"),   # c1 new in Jan
            (2, 1, "O", 5.0, datetime(2024, 1, 20), "p"),   # same month: new
            (3, 1, "O", 7.0, datetime(2024, 2, 5), "p"),    # returning
            (4, 2, "O", 20.0, datetime(2024, 2, 9), "p"),   # c2 new in Feb
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r.midx: r for r in
               REG["rel_new_vs_returning"].fn(spark, str(tmp_path)).collect()}
        jan, feb = sorted(got)
        assert (got[jan].n_new_orders, got[jan].n_returning_orders) == (2, 0)
        assert got[jan].new_revenue == 15.0
        assert (got[feb].n_new_orders, got[feb].n_returning_orders) == (1, 1)
        assert got[feb].new_revenue == 20.0
        assert got[feb].returning_revenue == 7.0


class TestHodEntropy:
    def test_habitual_vs_spread(self, spark, tmp_path):
        import math

        rows, eid = [], 0
        for d in range(12):
            eid += 1      # user 1 always at 09:00 -> entropy 0
            rows.append((eid, D0 + timedelta(days=d, hours=9), 1, "a", 1.0, "{}"))
        for h in range(24):
            eid += 1      # user 2 once per hour -> entropy ln 24
            rows.append((eid, D0 + timedelta(hours=h), 2, "a", 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.user_id: r for r in
               REG["ts_user_hod_entropy"].fn(spark, sf).collect()}
        assert got[1].hod_entropy == 0.0
        assert abs(got[2].hod_entropy - math.log(24)) < 1e-5
        assert abs(got[2].regularity_deficit - 1.0) < 1e-5


class TestEffectiveSampleSize:
    def test_alternating_series_tiny_ess(self, spark, tmp_path):
        # perfectly alternating series: rho_k alternates ±1, the 12-lag
        # sum ~= 0 -> factor near 1... the discriminating case is a
        # SMOOTH series: strong positive rho at all lags -> ESS << n.
        rows, eid = [], 0
        for h in range(120):
            eid += 1        # smooth ramp up/down with period 48
            v = float(abs((h % 48) - 24))
            rows.append((eid, D0 + timedelta(hours=h), 1, "smooth", v + 1, "{}"))
            eid += 1        # alternating
            rows.append((eid, D0 + timedelta(hours=h), 1, "alt",
                         100.0 if h % 2 == 0 else 10.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        got = {r.event_type: r for r in
               REG["ts_effective_sample_size"].fn(spark, sf).collect()}
        assert got["smooth"].effective_n < got["smooth"].n_obs / 3
        assert got["alt"].effective_n >= got["alt"].n_obs  # factor clamped


class TestABCXYZ:
    def test_planted_matrix(self, spark, tmp_path):
        # part 1: huge steady revenue (A, X: same qty every month);
        # part 2: small erratic (C, Z: single month).
        li, orders, ok = [], [], 0
        for m in range(1, 5):
            ok += 1
            orders.append((ok, 1, "O", 0.0, datetime(2024, m, 5), "p"))
            li.append((ok, 1, 1, 1, 10.0, 1000.0, 0.0, 0.0, "N", "O", D0))
        ok += 1
        orders.append((ok, 1, "O", 0.0, datetime(2024, 1, 9), "p"))
        li.append((ok, 2, 1, 1, 3.0, 1.0, 0.0, 0.0, "N", "O", D0))
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {(r.abc_class, r.xyz_class): r.n_parts for r in
               REG["rel_abc_xyz"].fn(spark, str(tmp_path)).collect()}
        assert got == {("A", "X"): 1, ("C", "Z"): 1}


class TestIntrinsicDim:
    def _write(self, spark, tmp_path, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        return str(tmp_path)

    def test_line_vs_plane(self, spark, tmp_path):
        import random

        rnd = random.Random(31)
        line = [(i, [rnd.uniform(0, 100)] + [0.0] * 63, 0) for i in range(150)]
        sf = self._write(spark, tmp_path, line)
        d_line = REG["emb_intrinsic_dim"].fn(spark, sf).collect()[0].intrinsic_dim
        plane = [
            (i, [rnd.uniform(0, 100), rnd.uniform(0, 100)] + [0.0] * 62, 0)
            for i in range(150)
        ]
        sf2 = self._write(spark, tmp_path, plane)
        d_plane = REG["emb_intrinsic_dim"].fn(spark, sf2).collect()[0].intrinsic_dim
        assert 0.5 < d_line < 1.6, d_line
        assert 1.4 < d_plane < 3.0, d_plane
        assert d_plane > d_line


class TestIntervalFuncs:
    def test_month_end_clamping(self, spark, tmp_path):
        orders = [
            (1, 1, "O", 1.0, datetime(2024, 1, 31), "p"),
            (2, 1, "O", 1.0, datetime(2024, 2, 10), "p"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r.o_orderkey: r for r in
               REG["sf_interval_funcs"].fn(spark, str(tmp_path)).collect()}
        assert got[1].plus_month == "2024-02-29"   # clamped (leap year)
        assert got[1].plus_30d == "2024-03-01"
        assert got[2].month_end == "2024-02-29"
        assert got[2].days_in_month == 29
        assert got[2].quarter_start == "2024-01-01"


class TestSimilarityHistogram:
    def test_shares_sum_and_planted_bins(self, spark, tmp_path):
        # pairs: (identical -> cos 1.0, bin 10), (orthogonal -> bin 0),
        # (opposite -> cos -1 -> bin -10)
        e1 = [1.0] + [0.0] * 63
        e2 = [0.0, 1.0] + [0.0] * 62
        rows = [
            (1, e1, 0), (2, e1, 0),     # pair (1,2): cos 1
            (3, e2, 0),                  # pair (2,3): orthogonal
            (4, [-1.0] + [0.0] * 63, 0), # pair (3,4): orthogonal
            (5, e1, 0),                  # pair (4,5): cos -1
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        got = {r.cos_bin_x10: r.n_pairs for r in
               REG["emb_similarity_histogram"].fn(spark, str(tmp_path)).collect()}
        assert got[10] == 1      # the identical pair
        assert got[0] == 2       # the two orthogonal pairs
        assert got[-10] == 1     # the opposite pair
        out = REG["emb_similarity_histogram"].fn(spark, str(tmp_path)).collect()
        assert abs(sum(r.share for r in out) - 1.0) < 1e-6


class TestNumericCorrelations:
    def test_planted_exact_and_zero(self, spark, tmp_path):
        # qty and price perfectly linear (r=1); discount constant ->
        # its pairs drop out (zero variance).
        li = []
        for i in range(6):
            q = float(i + 1)
            li.append((i + 1, 1, 1, 1, q, 10.0 * q, 0.05, 0.0, "N", "O", D0))
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {r.pair: r.pearson_r for r in
               REG["rel_numeric_correlations"].fn(spark, str(tmp_path)).collect()}
        assert got == {"quantity~price": 1.0}


class TestChannelBreakouts:
    def test_planted_break_and_warmup_guard(self, spark, tmp_path):
        # 30 flat hours then one spike: exactly one upside break; the
        # first 12 hours are warm-up and never evaluated.
        rows = []
        for h in range(31):
            v = 100.0 if h == 30 else 10.0
            rows.append((h + 1, D0 + timedelta(hours=h), 1, "a", v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        r = REG["ts_channel_breakouts"].fn(spark, sf).collect()[0]
        assert r.n_upside_breaks == 1
        assert r.n_downside_breaks == 0
        assert r.n_eval_hours == 31 - 12  # warm-up excluded

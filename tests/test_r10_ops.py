"""Round-10 guard tests: the two-pass range-bucketed exact quantile
scan (the few-groups width-parallel swap for count_table_quantiles —
VERDICT r9 item 2), the structurally-true doc_dup_clusters pruning
barrier, the schema-cache invalidation on rewrite, and
compact_parquet's returned sizing target (ADVICE r10 items).
"""

from __future__ import annotations

import pytest

from chrono_ts_spark.queries import load_all

REG = load_all()


class TestRangeBucketedQuantiles:
    """range_bucketed_quantiles must be bit-for-bit interchangeable
    with count_table_quantiles — same ranks, same interpolation op
    order, same null/all-null semantics — at any bucket width."""

    def _both(self, df, keys, col, ps, names, **kw):
        from chrono_ts_spark.operators.quantiles import (
            count_table_quantiles,
            range_bucketed_quantiles,
        )

        a = count_table_quantiles(df, keys, col, ps, names, **kw)
        b = range_bucketed_quantiles(df, keys, col, ps, names, **kw)
        ka = {tuple(r[k] for k in keys): r.asDict() for r in a.collect()}
        kb = {tuple(r[k] for k in keys): r.asDict() for r in b.collect()}
        return ka, kb

    def test_bit_identical_on_fixture_lineitem(self, spark):
        from chrono_ts_spark.catalog import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        ka, kb = self._both(
            li,
            ["l_returnflag"],
            "l_extendedprice",
            [0.0, 0.5, 0.9, 0.99, 1.0],
            ["q0", "p50", "p90", "p99", "q100"],
            n_name="n",
        )
        assert ka.keys() == kb.keys() and len(ka) == 3
        for k in ka:
            assert ka[k] == kb[k]

    def test_degenerate_groups_and_null_semantics(self, spark):
        rows = [
            ("a", 5.0),            # n=1: every quantile = the value
            ("b", 1.0), ("b", 1.0), ("b", 1.0),   # constant: mn == mx
            ("c", -3.5), ("c", 7.25),             # negative lower bound
            ("d", None), ("d", 2.0),              # null skipped, n=1
            ("e", None),                          # all-null: group DROPS
        ]
        df = spark.createDataFrame(rows, "k string, v double")
        ka, kb = self._both(
            df, ["k"], "v", [0.5, 0.9], ["p50", "p90"], n_name="n"
        )
        assert ka.keys() == kb.keys() == {("a",), ("b",), ("c",), ("d",)}
        for k in ka:
            assert ka[k] == kb[k]
        assert ka[("a",)]["p50"] == 5.0 and ka[("a",)]["n"] == 1
        assert ka[("b",)]["p50"] == 1.0
        assert ka[("d",)]["n"] == 1  # null skipped from the count

    def test_tiny_bucket_count_still_exact(self, spark):
        # B=2 forces many values per bucket — the bucket-local rank
        # resolution (pass 2) must carry the full exactness.
        rows = [("g", float(v)) for v in [9, 1, 7, 3, 5, 2, 8, 4, 6, 0]]
        df = spark.createDataFrame(rows, "k string, v double")
        from chrono_ts_spark.operators.quantiles import (
            range_bucketed_quantiles,
        )

        out = range_bucketed_quantiles(
            df, ["k"], "v", [0.25, 0.5, 0.75], ["q1", "q2", "q3"],
            n_buckets=2,
        ).collect()[0]
        # 0..9: pos(0.25)=2.25 -> 2 + 0.25*(3-2); etc.
        assert out["q1"] == pytest.approx(2.25)
        assert out["q2"] == pytest.approx(4.5)
        assert out["q3"] == pytest.approx(6.75)

    def test_null_keys_kept(self, spark):
        # ADVICE r11: a NULL group key must survive the internal
        # equi-joins (struct-key join treats null fields as equal),
        # matching count_table_quantiles' plain groupBy — the drop-in
        # contract on nullable keys.
        rows = [
            (None, 1.0), (None, 3.0), (None, 5.0),
            ("a", 10.0), ("a", 20.0),
        ]
        df = spark.createDataFrame(rows, "k string, v double")
        ka, kb = self._both(
            df, ["k"], "v", [0.5], ["p50"], n_name="n"
        )
        assert ka.keys() == kb.keys() == {(None,), ("a",)}
        for k in ka:
            assert ka[k] == kb[k]
        assert ka[(None,)]["p50"] == 3.0 and ka[(None,)]["n"] == 3

    def test_null_key_weighted_median(self, spark):
        from chrono_ts_spark.operators.quantiles import (
            range_bucketed_weighted_median,
        )

        rows = [(None, 1, 1), (None, 2, 2), (None, 3, 1), ("a", 7, 5)]
        df = spark.createDataFrame(rows, "k string, v bigint, w bigint")
        out = {
            r.k: (r["__tw"], r["__lo"], r["__hi"])
            for r in range_bucketed_weighted_median(
                df, ["k"], "v", "w"
            ).collect()
        }
        # null key: weights 1,2,1 over 1,2,3 -> W=4, lo=hi=2
        assert out[None] == (4, 2, 2)
        assert out["a"] == (5, 7, 7)

    def test_bigint_domain(self, spark):
        rows = [("g", v) for v in [10, 20, 20, 40, 1000000000000]]
        df = spark.createDataFrame(rows, "k string, v bigint")
        ka, kb = self._both(df, ["k"], "v", [0.5, 1.0], ["p50", "mx"])
        assert ka == kb
        assert ka[("g",)]["p50"] == 20.0
        assert ka[("g",)]["mx"] == 1000000000000.0


class TestDupClustersBarrier:
    def test_negative_doc_ids_keep_rare_shingles(self, spark, tmp_path):
        # ADVICE r10: the old max(doc_id) >= 0 barrier silently dropped
        # qualifying shingle groups when every doc_id in the group was
        # negative. The count(doc_id) >= 1 barrier is structurally true
        # for any bigint input: two near-identical docs with NEGATIVE
        # ids must still pair up and cluster together.
        import pyspark.sql.functions as F  # noqa: F401

        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = spark.createDataFrame(
            [(-5, text, "en", "s", len(text)),
             (-9, text, "en", "s", len(text)),
             (7, "totally different words entirely unrelated content here pad pad", "en", "s", 62)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        sf = str(tmp_path / "negdocs")
        docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
        out = {r.doc_id: r for r in REG["doc_dup_clusters"].fn(spark, sf).collect()}
        assert out[-5].cluster_id == out[-9].cluster_id
        assert out[-5].cluster_size == 2
        assert out[7].cluster_size == 1


class TestSchemaCacheInvalidation:
    def test_rewrite_at_same_path_reinfers(self, spark, tmp_path):
        # ADVICE r10: the r9 per-path-forever cache served a stale
        # schema after an in-process rewrite. The (path, mtime, size)
        # key must re-infer.
        import os
        import time

        from chrono_ts_spark.catalog import observed_schema

        p = str(tmp_path / "t.parquet")
        spark.range(3).selectExpr("id AS a").write.mode("overwrite").parquet(p)
        s1 = observed_schema(spark, p)
        assert [f.name for f in s1.fields] == ["a"]
        time.sleep(0.05)  # ensure a distinct mtime_ns even on coarse fs
        spark.range(3).selectExpr(
            "id AS a", "CAST(id AS STRING) AS b"
        ).write.mode("overwrite").parquet(p)
        os.utime(p)
        s2 = observed_schema(spark, p)
        assert [f.name for f in s2.fields] == ["a", "b"]

    def test_unchanged_path_serves_cache(self, spark, tmp_path):
        from chrono_ts_spark import catalog

        p = str(tmp_path / "u.parquet")
        spark.range(2).write.mode("overwrite").parquet(p)
        catalog.observed_schema(spark, p)
        hits = [k for k in catalog._SCHEMA_CACHE if k[0] == p]
        assert len(hits) == 1
        catalog.observed_schema(spark, p)
        assert [k for k in catalog._SCHEMA_CACHE if k[0] == p] == hits


class TestClampedBalanceClosedForm:
    def test_matches_sequential_replay_on_planted_deltas(self, spark, tmp_path):
        # b_i = s_i - min(0, cummin(s)_i) must replay the literal
        # max(0, prev + delta) recurrence through repeated clamps,
        # zero-crossings, and an all-negative series.
        from datetime import date

        rows = []
        ok = 0
        series = {
            1: [5.0, -10.0, 3.0],                 # clamp mid-series
            2: [-5.0, -5.0, 10.0, -100.0, 50.0],  # repeated clamps
            3: [-1.0, -2.0, -3.0],                # never leaves zero
            4: [7.0, 7.0],                        # never clamps
        }
        for cust, deltas in series.items():
            for i, d in enumerate(deltas):
                ok += 1
                # status F debits (negative), O credits — encode the
                # sign via status so the query's CASE sees both arms
                status = "F" if d < 0 else "O"
                rows.append(
                    (ok, cust, status, abs(d), date(2024, 1, i + 1), "1-URGENT")
                )
        df = spark.createDataFrame(
            rows,
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate date, o_orderpriority string",
        )
        sf = str(tmp_path / "orders_fixture")
        df.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
        out = REG["rel_clamped_balance"].fn(spark, sf).collect()
        got = {}
        for r in out:
            got.setdefault(r.o_custkey, []).append(
                (r.o_orderkey, r.balance_cents, r.clamped)
            )
        for cust, deltas in series.items():
            bal, expect = 0, []
            for d in deltas:
                cents = int(round(d * 100))
                bal += cents
                clamped = 1 if bal < 0 else 0
                bal = max(0, bal)
                expect.append((bal, clamped))
            rows_for = sorted(got[cust])
            assert [(b, c) for _, b, c in rows_for] == expect, (cust, rows_for, expect)


class TestNullsafeJoinClosedForm:
    def test_count_table_matches_pair_enumeration(self, spark, tmp_path):
        # closed-form n*(n-1)/2 per (segment, key-class incl NULL)
        # must equal brute-force pair enumeration, and the NULL class
        # must survive only via <=>.
        rows = []
        ck = 0
        # segment A: nk classes 0 (3 members), NULL (2 members)
        for nation in (0, 5, 10):   # %5 == 0 -> nk 0
            ck += 1
            rows.append((ck, f"c{ck}", nation, 100.0, "A"))
        for nation in (3, 8):       # %5 == 3 -> NULLIF -> NULL
            ck += 1
            rows.append((ck, f"c{ck}", nation, 100.0, "A"))
        # segment B: one lone NULL (no pairs at all)
        ck += 1
        rows.append((ck, f"c{ck}", 13, 100.0, "B"))
        df = spark.createDataFrame(
            rows,
            "c_custkey bigint, c_name string, c_nationkey bigint, "
            "c_acctbal double, c_mktsegment string",
        )
        sf = str(tmp_path / "cust_fixture")
        df.write.mode("overwrite").parquet(f"{sf}/customer.parquet")
        out = {r.c_mktsegment: r for r in REG["rel_nullsafe_join"].fn(spark, sf).collect()}
        assert out["A"].n_nullsafe_pairs == 3 + 1  # C(3,2) + C(2,2)
        assert out["A"].n_eq_pairs == 3
        assert out["A"].n_null_pairs == 1
        # segment B has only singleton classes -> zero pairs -> the
        # oracle's a.c_custkey < b.c_custkey join emits NO row, and
        # (r11) the closed form now matches that exactly.
        assert "B" not in out


class TestWeightedMedianTwoPass:
    def test_planted_weights_including_exact_half_tie(self, spark):
        # lo != hi exactly when the half-weight point falls between
        # two values; the bucket-local resolution must agree with the
        # per-row definition on ties, singletons, and heavy tails.
        from chrono_ts_spark.operators.quantiles import (
            range_bucketed_weighted_median,
        )

        rows = [
            # key a: weights 1,1 over values 10,20 -> W=2, half=1:
            # lo = 10 (2*1 >= 2), hi = 20 (2*1 > 2 is false at 10)
            ("a", 10, 1), ("a", 20, 1),
            # key b: one heavy value dominates
            ("b", 5, 100), ("b", 99, 1),
            # key c: singleton
            ("c", 7, 3),
            # key d: equal-value run crossing mid-run
            ("d", 4, 1), ("d", 4, 1), ("d", 9, 1),
        ]
        df = spark.createDataFrame(rows, "k string, v bigint, w bigint")
        got = {
            r["k"]: (r["__tw"], r["__lo"], r["__hi"])
            for r in range_bucketed_weighted_median(df, ["k"], "v", "w").collect()
        }
        assert got["a"] == (2, 10, 20)
        assert got["b"] == (101, 5, 5)
        assert got["c"] == (3, 7, 7)
        assert got["d"] == (3, 4, 4)


class TestApproxDistinctDecomposed:
    def test_envelope_and_equality_with_combined_form(self, spark):
        # The r10 decomposition (sketch pass + two-level exact pass +
        # |groups|-row join) must return exactly what the old
        # single-agg Expand form returned, and the sketch must sit in
        # the +-5% envelope the docstring promises.
        import pyspark.sql.functions as F

        from chrono_ts_spark.catalog import load_table

        sf = "/root/testdata/sf0.001"
        got = {
            r.l_returnflag: r
            for r in REG["rel_approx_distinct"].fn(spark, sf).collect()
        }
        li = load_table(spark, sf, "lineitem")
        old = {
            r.l_returnflag: r
            for r in li.groupBy("l_returnflag")
            .agg(
                F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
                F.countDistinct("l_partkey").alias("exact_parts"),
            )
            .collect()
        }
        assert got.keys() == old.keys() and len(got) == 3
        for k in got:
            assert got[k].exact_parts == old[k].exact_parts
            assert got[k].approx_parts == old[k].approx_parts  # same sketch
            assert abs(got[k].approx_parts - got[k].exact_parts) <= max(
                2, 0.05 * got[k].exact_parts
            )


class TestCompactParquetSizing:
    def test_returns_its_own_target(self, spark, tmp_path):
        from chrono_ts_spark.queries.extras import compact_parquet

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        spark.range(100000).selectExpr(
            "id", "CAST(id AS STRING) AS s"
        ).repartition(20).write.mode("overwrite").parquet(src)
        before, after, n_out = compact_parquet(
            spark, src, dst, target_bytes=256 * 1024
        )
        assert before == 20
        # the caller-facing invariant io_compaction now asserts:
        # files_after == min(n_out, rows); here rows >> n_out
        assert after == n_out

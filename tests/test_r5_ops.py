"""Round-5 operator tests on planted data: cross-series correlation,
burst detection, inverted index, and RRF fusion — edge cases the
fixture tables can't force (perfect/anti correlation, exact burst
threshold boundaries, rank-fusion tie handling).

The registry queries read ``{dir}/events.parquet`` etc. via
catalog.load_table, so each test writes a minimal planted table into
tmp_path and calls the query on that directory.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

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


def t(h, m=0):
    return datetime(2024, 1, 1, h, m, 0)


class TestSeriesCorr:
    def test_perfect_and_anti_correlation(self, spark, tmp_path):
        # Two hourly buckets; series b = a (perfect), series c = -a + const
        # (perfect anti). Integer moments make the result exactly ±1.0.
        rows = []
        eid = 0
        for hour, va in [(0, 10.0), (1, 20.0), (2, 40.0)]:
            for etype, v in [("a", va), ("b", va), ("c", 60.0 - va)]:
                eid += 1
                rows.append((eid, t(hour), 1, etype, v, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = {
            (r.type_a, r.type_b): r
            for r in REG["ts_series_corr"].fn(spark, sf).collect()
        }
        assert out[("a", "b")].corr == 1.0
        assert out[("a", "c")].corr == -1.0
        assert out[("b", "c")].corr == -1.0
        assert out[("a", "b")].n_buckets == 3

    def test_alignment_is_inner(self, spark, tmp_path):
        # type "a" active in 3 buckets, "b" only in 2 -> pair sees 2.
        rows = [
            (1, t(0), 1, "a", 1.0, "{}"),
            (2, t(1), 1, "a", 2.0, "{}"),
            (3, t(2), 1, "a", 3.0, "{}"),
            (4, t(0), 1, "b", 1.0, "{}"),
            (5, t(2), 1, "b", 5.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_series_corr"].fn(spark, sf).collect()
        assert len(out) == 1 and out[0].n_buckets == 2

    def test_degenerate_pairs_filtered(self, spark, tmp_path):
        # r6 guard (ADVICE r5): zero-variance series and single-shared-
        # bucket pairs are dropped, not NULL/NaN — and identically in
        # the oracle, where DuckDB division by zero would give inf.
        rows = [
            # "a" varies over 3 buckets; "flat" is constant over the same
            (1, t(0), 1, "a", 1.0, "{}"),
            (2, t(1), 1, "a", 2.0, "{}"),
            (3, t(2), 1, "a", 3.0, "{}"),
            (4, t(0), 1, "flat", 7.0, "{}"),
            (5, t(1), 1, "flat", 7.0, "{}"),
            (6, t(2), 1, "flat", 7.0, "{}"),
            # "once" shares exactly one bucket with "a" (n = 1)
            (7, t(2), 1, "once", 9.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_series_corr"].fn(spark, sf).collect()
        assert out == []  # (a,flat): zero variance; (a,once)/(flat,once): n=1


class TestBurstDetect:
    def _baseline_plus_current(self, spark, tmp_path, current_n):
        # 12 buckets of exactly 1 event, then a current bucket with
        # current_n events. Threshold: cnt*12 > 3*trail = 3*12 = 36
        # -> burst iff cnt > 3.
        rows = []
        eid = 0
        base = datetime(2024, 1, 1, 0, 0, 0)
        for b in range(12):
            eid += 1
            rows.append((eid, base + timedelta(minutes=5 * b), 1, "x", 1.0, "{}"))
        for _ in range(current_n):
            eid += 1
            rows.append((eid, base + timedelta(minutes=60), 1, "x", 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = REG["ts_burst_detect"].fn(spark, sf).collect()
        # only the 13th bucket has a full 12-bucket trailing baseline
        assert len(out) == 1
        return out[0]

    def test_exact_threshold_not_burst(self, spark, tmp_path):
        r = self._baseline_plus_current(spark, tmp_path, 3)  # 36 > 36 false
        assert r.cnt == 3 and r.trail == 12 and r.is_burst == 0

    def test_above_threshold_burst(self, spark, tmp_path):
        r = self._baseline_plus_current(spark, tmp_path, 4)  # 48 > 36 true
        assert r.cnt == 4 and r.is_burst == 1

    def test_partial_baseline_suppressed(self, spark, tmp_path):
        # Only 5 trailing buckets -> no row emitted at all.
        rows = []
        base = datetime(2024, 1, 1, 0, 0, 0)
        for b in range(6):
            rows.append((b + 1, base + timedelta(minutes=5 * b), 1, "x", 1.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        assert REG["ts_burst_detect"].fn(spark, sf).count() == 0


class TestInvertedIndex:
    def _write_docs(self, spark, tmp_path, docs):
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_postings_sorted_and_df_band(self, spark, tmp_path):
        docs = []
        # "common" in 6 docs, "rare" in 1, "mid" in 5
        for i in range(6):
            text = "common" + (" mid" if i < 5 else "") + (" rare" if i == 0 else "")
            docs.append((i, text, "en", "s", len(text)))
        sf = self._write_docs(spark, tmp_path, docs)
        rows = REG["doc_inverted_index"].fn(spark, sf).collect()
        assert {r.token for r in rows} == {"common", "mid"}  # total-df >= 5 band
        merged: dict = {}
        for r in rows:
            # postings serialize as a comma-joined string at the query
            # boundary (driver canonicalizer contract)
            postings = [int(x) for x in r.postings.split(",")]
            assert postings == sorted(postings)  # sorted within shard
            assert r.df_shard == len(postings)
            merged.setdefault(r.token, []).extend(postings)
            assert r.df == (6 if r.token == "common" else 5)  # df is the TOTAL
        assert sorted(merged["common"]) == [0, 1, 2, 3, 4, 5]
        assert sorted(merged["mid"]) == [0, 1, 2, 3, 4]

    def test_stop_word_shard_bound(self, spark, tmp_path):
        # r6 hot-key guard: a stop word hitting every one of 200 docs
        # must spread over the md5 shards instead of producing one
        # 200-id posting list in a single reducer.
        from chrono_ts_spark.queries.text import _INV_SHARDS, inverted_index

        n = 200
        docs = [(i, "the unique%d" % i, "en", "s", 10) for i in range(n)]
        self._write_docs(spark, tmp_path, docs)
        d = spark.read.parquet(str(tmp_path / "documents.parquet"))
        rows = [r for r in inverted_index(d).collect() if r.token == "the"]
        assert len(rows) == _INV_SHARDS  # every shard non-empty at n=200
        assert all(r.df == n for r in rows)
        # bound: no shard materializes more than ~2x the even share
        assert max(len(r.postings) for r in rows) <= 2 * n // _INV_SHARDS
        assert sorted(x for r in rows for x in r.postings) == list(range(n))
        # the unique tokens (df=1) are below the floor
        assert {r.token for r in inverted_index(d).collect()} == {"the"}


class TestRrfFusion:
    def test_fusion_on_fixture(self, spark):
        from chrono_ts_spark.queries.text import _RRF_POOL

        out = REG["doc_rrf_fusion"].fn(spark, "/root/testdata/sf0.001").collect()
        assert 0 < len(out) <= 50
        by_rnk = sorted(out, key=lambda r: r.rnk)
        # rrf must equal the formula from its own (pool-bounded,
        # possibly NULL) integer ranks, and be monotonically
        # non-increasing in rnk with doc_id tiebreak
        for r in by_rnk:
            expect = (1.0 / (60 + r.r_cos) if r.r_cos is not None else 0.0) + (
                1.0 / (60 + r.r_tok) if r.r_tok is not None else 0.0
            )
            assert r.rrf == pytest.approx(expect, abs=0)
            assert r.r_cos is not None or r.r_tok is not None
            assert r.r_cos is None or 1 <= r.r_cos <= _RRF_POOL
            assert r.r_tok is None or 1 <= r.r_tok <= _RRF_POOL
        for a, b in zip(by_rnk, by_rnk[1:]):
            assert (a.rrf, -a.doc_id) >= (b.rrf, -b.doc_id)
        # probe doc itself ranks #1 on cosine (self-similarity = 1)
        r_cos_1 = [r for r in out if r.r_cos == 1]
        assert r_cos_1 and r_cos_1[0].doc_id == 0

    def test_pool_cut_is_plan_bounded(self, spark):
        # the scale contract: no unpartitioned Window may see a scan
        # that is not GlobalLimit-bounded (tools/explain_audit rule)
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from explain_audit import unguarded_global_windows

        from chrono_ts_spark.planinfo import optimized_plan

        df = REG["doc_rrf_fusion"].fn(spark, "/root/testdata/sf0.001")
        plan = optimized_plan(df)
        assert unguarded_global_windows(plan) == []
        assert "GlobalLimit 200" in plan  # the pool cut survives optimization


class TestBinaryScan:
    def test_sizes_and_md5_match_ground_truth(self, spark):
        import hashlib
        import os

        sf = "/root/testdata/sf0.001"
        out = {r.fname: r for r in REG["io_binary_scan"].fn(spark, sf).collect()}
        names = [f for f in os.listdir(sf) if f.endswith(".parquet")]
        assert set(out) == set(names) and len(names) == 10
        for f in names:
            p = os.path.join(sf, f)
            assert out[f].n_bytes == os.stat(p).st_size
            assert out[f].content_md5 == hashlib.md5(open(p, "rb").read()).hexdigest()

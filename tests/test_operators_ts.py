"""Unit tests for the signature TSDB operators on hand-computed
fixtures (SURVEY.md §5.2): edge cases the fixture tables can't force —
empty inputs, equal timestamps, counter resets, single-point series.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.operators import (
    asof_join,
    gapfill,
    range_join,
    rate,
    sessionize,
    top_k_per_group,
)
from chrono_ts_spark.operators.rangejoin import range_join_count


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:00"), 1),
            ("A", ts("2024-01-01 10:05:00"), 2),
            ("A", ts("2024-01-01 10:10:00"), 3),
            ("B", ts("2024-01-01 10:03:00"), 4),
        ],
        "key string, ts timestamp, trade_id int",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 09:59:00"), 100.0),
            ("A", ts("2024-01-01 10:05:00"), 101.0),  # equal-ts match
            ("A", ts("2024-01-01 10:07:00"), 102.0),
            ("C", ts("2024-01-01 10:00:00"), 999.0),  # unmatched key
        ],
        "key string, ts timestamp, px double",
    )


class TestAsofJoin:
    def test_backward_semantics(self, trades, quotes):
        out = asof_join(trades, quotes, on=["key"], right_cols=["px"]).collect()
        got = {r.trade_id: (r.px_r, r.ts_r) for r in out}
        assert len(out) == 4  # every left row survives
        assert got[1] == (100.0, ts("2024-01-01 09:59:00"))
        assert got[2] == (101.0, ts("2024-01-01 10:05:00"))  # ties match
        assert got[3] == (102.0, ts("2024-01-01 10:07:00"))
        assert got[4] == (None, None)  # key B has no quotes

    def test_tolerance(self, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], right_cols=["px"], tolerance_seconds=90
        ).collect()
        got = {r.trade_id: r.px_r for r in out}
        assert got[1] == 100.0  # 60s old: inside tolerance
        assert got[3] is None  # 180s old: outside tolerance → nulled
        # tolerance only nulls, never drops
        assert len(out) == 4

    def test_empty_right(self, spark, trades):
        empty = spark.createDataFrame([], "key string, ts timestamp, px double")
        out = asof_join(trades, empty, on=["key"], right_cols=["px"]).collect()
        assert len(out) == 4 and all(r.px_r is None for r in out)

    def test_duplicate_right_ts_struct_max(self, spark):
        # Several right rows share (key, ts): the deterministic pick is
        # the payload-struct max (max px; non-NULL beats NULL) — the rule
        # the oracle SQL mirrors with row_number ... ORDER BY value DESC.
        left = spark.createDataFrame(
            [("A", ts("2024-01-01 10:00:00"), 1)], "key string, ts timestamp, tid int"
        )
        right = spark.createDataFrame(
            [("A", ts("2024-01-01 09:59:00"), None),
             ("A", ts("2024-01-01 09:59:00"), 103.0),
             ("A", ts("2024-01-01 09:59:00"), 101.0)],
            "key string, ts timestamp, px double",
        )
        out = asof_join(left, right, on=["key"], right_cols=["px"]).collect()
        assert len(out) == 1 and out[0].px_r == 103.0


class TestRate:
    def test_counter_reset_and_dt(self, spark):
        df = spark.createDataFrame(
            [
                ("A", ts("2024-01-01 00:00:00"), 10.0),
                ("A", ts("2024-01-01 00:00:10"), 15.0),
                ("A", ts("2024-01-01 00:00:20"), 3.0),  # counter reset
                ("B", ts("2024-01-01 00:00:00"), 5.0),  # single point
            ],
            "key string, ts timestamp, v double",
        )
        out = {
            (r.key, r.ts): (r.delta, r.dt_seconds, r.rate_per_s)
            for r in rate(df, ["key"], "ts", "v").collect()
        }
        assert out[("A", ts("2024-01-01 00:00:10"))] == (5.0, 10.0, 0.5)
        # reset: delta falls back to the raw value
        assert out[("A", ts("2024-01-01 00:00:20"))] == (3.0, 10.0, 0.3)
        # first rows and single-point series are dropped
        assert len(out) == 2

    def test_duplicate_ts_dropped(self, spark):
        df = spark.createDataFrame(
            [("A", ts("2024-01-01 00:00:00"), 1.0, 1), ("A", ts("2024-01-01 00:00:00"), 2.0, 2)],
            "key string, ts timestamp, v double, id int",
        )
        assert rate(df, ["key"], "ts", "v", tiebreak=["id"]).count() == 0


class TestGapfill:
    def test_spine_locf_interp(self, spark):
        df = spark.createDataFrame(
            [
                ("A", ts("2024-01-01 00:00:30"), 10.0),
                ("A", ts("2024-01-01 03:00:30"), 40.0),
            ],
            "key string, ts timestamp, v double",
        )
        out = gapfill(
            df, ["key"], "ts", "v", 3600,
            "2024-01-01 00:00:00", "2024-01-01 04:00:00",
        ).orderBy("bucket_ts").collect()
        assert len(out) == 5  # 00..04 inclusive
        vals = [(r.value, r.value_locf, r.value_interp) for r in out]
        assert vals[0] == (10.0, 10.0, 10.0)
        assert vals[1] == (None, 10.0, 20.0)  # linear between 10 and 40
        assert vals[2] == (None, 10.0, 30.0)
        assert vals[3] == (40.0, 40.0, 40.0)
        assert vals[4] == (None, 40.0, None)  # after last obs: LOCF only

    def test_row_count_invariant(self, spark):
        df = spark.createDataFrame(
            [("A", ts("2024-01-01 01:00:00"), 1.0), ("B", ts("2024-01-01 02:00:00"), 2.0)],
            "key string, ts timestamp, v double",
        )
        out = gapfill(df, ["key"], "ts", "v", 3600, "2024-01-01 00:00:00", "2024-01-01 23:00:00")
        assert out.count() == 2 * 24  # keys × buckets, exactly


class TestSessionize:
    def test_gap_boundary(self, spark):
        df = spark.createDataFrame(
            [
                ("u", ts("2024-01-01 00:00:00"), 1),
                ("u", ts("2024-01-01 00:30:00"), 2),   # exactly gap: same session
                ("u", ts("2024-01-01 01:00:01"), 3),   # gap+1s: new session
            ],
            "key string, ts timestamp, id int",
        )
        out = {r.id: r.session_id for r in sessionize(df, ["key"], "ts", 1800).collect()}
        assert out == {1: 0, 2: 0, 3: 1}


class TestRangeJoin:
    def test_matches_naive(self, spark):
        import random

        rnd = random.Random(0)
        probes = [("k%d" % (i % 3), ts("2024-01-01 00:00:00"), i) for i in range(20)]
        probes = [
            (k, t.replace(minute=rnd.randrange(60), second=rnd.randrange(60)), i)
            for (k, t, i) in probes
        ]
        builds = [
            ("k%d" % rnd.randrange(3),
             ts("2024-01-01 00:00:00").replace(minute=rnd.randrange(60), second=rnd.randrange(60)))
            for _ in range(200)
        ]
        p = spark.createDataFrame(probes, "key string, ts timestamp, pid int")
        b = spark.createDataFrame(builds, "key string, ts timestamp")
        got = {
            r.pid: r.n
            for r in range_join_count(p, b, ["key"], "ts", "ts", 600, "pid", "n").collect()
        }
        for key, t, pid in probes:
            want = sum(
                1 for (bk, bt) in builds
                if bk == key and (t.timestamp() - 600) * 1e6 < bt.timestamp() * 1e6 <= t.timestamp() * 1e6
            )
            assert got[pid] == want, pid

    def test_inner_range_join(self, spark):
        p = spark.createDataFrame(
            [("k", ts("2024-01-01 00:10:00"), 1)], "key string, ts timestamp, pid int"
        )
        b = spark.createDataFrame(
            [("k", ts("2024-01-01 00:05:00"), 7.0),   # in window
             ("k", ts("2024-01-01 00:10:00"), 8.0),   # boundary: inclusive
             ("k", ts("2024-01-01 00:00:00"), 9.0)],  # exactly lookback: excluded
            "key string, bts timestamp, v double",
        )
        out = range_join(p, b, ["key"], "ts", "bts", 600)
        assert sorted(r.v for r in out.collect()) == [7.0, 8.0]

    def test_left_range_join(self, spark):
        p = spark.createDataFrame(
            [("k", ts("2024-01-01 00:10:00"), 1),
             ("k", ts("2024-01-01 02:00:00"), 2),   # no clicks in window
             ("x", ts("2024-01-01 00:10:00"), 3)],  # key with no build rows
            "key string, ts timestamp, pid int",
        )
        b = spark.createDataFrame(
            [("k", ts("2024-01-01 00:05:00"), 7.0),
             ("k", ts("2024-01-01 00:10:00"), 8.0),
             ("k", ts("2024-01-01 00:00:00"), 9.0)],  # exactly lookback: out
            "key string, bts timestamp, v double",
        )
        out = range_join(p, b, ["key"], "ts", "bts", 600, how="left", probe_id="pid")
        rows = sorted(((r.pid, r.v) for r in out.collect()))
        assert rows == [(1, 7.0), (1, 8.0), (2, None), (3, None)]

    def test_left_requires_probe_id(self, spark):
        import pytest as _pytest

        p = spark.createDataFrame([("k", ts("2024-01-01 00:10:00"))], "key string, ts timestamp")
        with _pytest.raises(ValueError):
            range_join(p, p, ["key"], "ts", "ts", 600, how="left")

    def test_interval_join_single_emission(self, spark):
        from chrono_ts_spark.operators.rangejoin import interval_join

        # left interval spans many buckets and overlaps the right one in
        # several of them: the canonical-bucket rule must emit the pair
        # exactly once, with no dropDuplicates in the plan.
        l = spark.createDataFrame(
            [("k", ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00"), 1),
             ("k", ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00"), 2)],
            "key string, ls timestamp, le timestamp, lid int",
        )
        r = spark.createDataFrame(
            [("k", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:30:00"), 10),
             ("k", ts("2024-01-01 02:59:00"), ts("2024-01-01 04:00:00"), 11),  # touches lid=1 end
             ("k", ts("2024-01-01 03:00:01"), ts("2024-01-01 04:00:00"), 12),  # just after: no overlap
             ("x", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00"), 13)],  # other key
            "key string, rs timestamp, re timestamp, rid int",
        )
        out = interval_join(
            l, r, on=["key"], left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_seconds=600,
        )
        pairs = sorted((row.lid, row.rid) for row in out.collect())
        assert pairs == [(1, 10), (1, 11)]
        from chrono_ts_spark.planinfo import analyzed_plan

        assert "Deduplicate" not in analyzed_plan(out)

    def test_pre_epoch_floor_bucketing(self, spark):
        # Truncation-toward-zero would misbucket pre-1970 timestamps;
        # floor must keep window semantics identical on both sides of 0.
        p = spark.createDataFrame(
            [("k", ts("1969-12-31 23:59:50"), 1)], "key string, ts timestamp, pid int"
        )
        b = spark.createDataFrame(
            [("k", ts("1969-12-31 23:55:00"), 1.0),   # in window (290s back)
             ("k", ts("1969-12-31 23:49:49"), 2.0),   # 601s back: out
             ("k", ts("1970-01-01 00:00:00"), 3.0)],  # after probe: out
            "key string, bts timestamp, v double",
        )
        out = range_join(p, b, ["key"], "ts", "bts", 600)
        assert [r.v for r in out.collect()] == [1.0]


class TestTopK:
    def test_ties_deterministic(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0, 1), ("g", 1.0, 2), ("g", 1.0, 3)], "g string, m double, id int"
        )
        out = top_k_per_group(df, ["g"], [F.col("m").desc(), F.col("id")], 2).collect()
        assert [r.id for r in sorted(out, key=lambda r: r.rnk)] == [1, 2]


class TestAsofForward:
    def test_forward_semantics(self, spark, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], right_cols=["px"], direction="forward"
        ).collect()
        got = {r.trade_id: (r.px_r, r.ts_r) for r in out}
        assert got[1] == (101.0, ts("2024-01-01 10:05:00"))
        assert got[2] == (101.0, ts("2024-01-01 10:05:00"))  # equality included
        assert got[3] == (None, None)  # nothing after 10:10
        assert got[4] == (None, None)

    def test_forward_tolerance(self, spark, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], right_cols=["px"],
            direction="forward", tolerance_seconds=120,
        ).collect()
        got = {r.trade_id: r.px_r for r in out}
        assert got[1] is None  # 10:05 is 300s ahead: outside tolerance
        assert got[2] == 101.0  # exact match: inside

    def test_bad_direction(self, spark, trades, quotes):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            asof_join(trades, quotes, on=["key"], direction="sideways")


class TestAsofNearest:
    def test_nearest_semantics(self, spark):
        left = spark.createDataFrame(
            [("A", ts("2024-01-01 10:00:00"), 1),   # back 60s vs fwd 120s -> back
             ("A", ts("2024-01-01 10:03:30"), 2),   # back 150s vs fwd 90s -> fwd
             ("A", ts("2024-01-01 10:02:00"), 3),   # exact tie 60s -> backward
             ("B", ts("2024-01-01 10:00:00"), 4)],  # no quotes: null
            "key string, ts timestamp, tid int",
        )
        right = spark.createDataFrame(
            [("A", ts("2024-01-01 09:59:00"), 100.0),
             ("A", ts("2024-01-01 10:01:00"), 101.0),
             ("A", ts("2024-01-01 10:05:00"), 102.0)],
            "key string, ts timestamp, px double",
        )
        got = {
            r.tid: r.px_r
            for r in asof_join(
                left, right, on=["key"], right_cols=["px"], direction="nearest"
            ).collect()
        }
        assert got == {1: 100.0, 2: 102.0, 3: 101.0, 4: None}
        # tid=3: 10:02 is 60s after 10:01 and 180s before 10:05 -> 101;
        # a true tie is covered by the pandas-equivalence test below

    def test_nearest_matches_pandas(self, spark, trades, quotes):
        from chrono_ts_spark.operators.asof import asof_join_pandas

        native = asof_join(
            trades, quotes, on=["key"], right_cols=["px"], direction="nearest"
        )
        pandas_form = asof_join_pandas(
            trades, quotes, on=["key"], right_cols=["px"], direction="nearest"
        )
        cols = sorted(native.columns)
        a = sorted(tuple(r) for r in native.select(*cols).collect())
        b = sorted(tuple(r) for r in pandas_form.select(*cols).collect())
        assert a == b

    def test_nearest_tolerance(self, spark, trades, quotes):
        out = asof_join(
            trades, quotes, on=["key"], right_cols=["px"],
            direction="nearest", tolerance_seconds=90,
        ).collect()
        got = {r.trade_id: r.px_r for r in out}
        assert len(out) == 4  # tolerance nulls, never drops


def _nskey(rows):
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


class TestAsofPandasEquivalence:
    def test_matches_window_form(self, spark, trades, quotes):
        from chrono_ts_spark.operators.asof import asof_join_pandas

        for direction in ("backward", "forward"):
            a = asof_join(
                trades, quotes, on=["key"], right_cols=["px"], direction=direction
            )
            b = asof_join_pandas(
                trades, quotes, on=["key"], right_cols=["px"], direction=direction
            )
            ka = _nskey(a.select(sorted(a.columns)).collect())
            kb = _nskey(b.select(sorted(b.columns)).collect())
            assert ka == kb, direction

    def test_matches_on_fixture_events(self, spark):
        from chrono_ts_spark.operators.asof import asof_join_pandas
        from chrono_ts_spark.catalog import load_table
        from tests.conftest import SF_SMOKE

        ev = load_table(spark, SF_SMOKE, "events")
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts", "value"
        )
        clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
        a = asof_join(purchases, clicks, on=["user_id"], right_cols=["value"])
        b = asof_join_pandas(purchases, clicks, on=["user_id"], right_cols=["value"])
        cols = sorted(a.columns)
        assert _nskey(a.select(cols).collect()) == _nskey(b.select(cols).collect())


class TestAsofNullPayload:
    def test_matched_row_null_payload_not_backfilled(self, spark):
        """Review finding: carrying payload columns independently would
        stitch an older row's value onto a newer row's timestamp when
        the matched row has a NULL payload. The struct carry keeps row
        unity: the matched row's NULL stays NULL."""
        left = spark.createDataFrame(
            [("A", ts("2024-01-01 10:10:00"), 1)],
            "key string, ts timestamp, trade_id int",
        )
        right = spark.createDataFrame(
            [("A", ts("2024-01-01 10:00:00"), 100.0),
             ("A", ts("2024-01-01 10:05:00"), None)],  # matched row, NULL px
            "key string, ts timestamp, px double",
        )
        out = asof_join(left, right, on=["key"], right_cols=["px"]).collect()
        assert len(out) == 1
        r = out[0]
        assert r.ts_r == ts("2024-01-01 10:05:00")  # matched the later row
        assert r.px_r is None  # and kept ITS value, not 100.0


class TestGapfillValidation:
    def test_unaligned_start_rejected(self, spark):
        df = spark.createDataFrame(
            [("A", ts("2024-01-01 01:00:00"), 1.0)], "key string, ts timestamp, v double"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not aligned"):
            gapfill(df, ["key"], "ts", "v", 3600,
                    "2024-01-01 00:30:00", "2024-01-01 04:30:00")


class TestLTTB:
    def test_small_series_pass_through(self, spark):
        from chrono_ts_spark.operators.lttb import lttb_downsample

        df = spark.createDataFrame(
            [("a", ts("2024-01-01 00:00:00"), 1.0),
             ("a", ts("2024-01-01 01:00:00"), 2.0)],
            "key string, ts timestamp, v double",
        )
        out = lttb_downsample(df, ["key"], "ts", "v", 10).collect()
        assert len(out) == 2

    def test_matches_reference_and_keeps_extremes(self, spark):
        import math

        from chrono_ts_spark.operators.lttb import (
            lttb_downsample,
            lttb_select_indices,
        )

        # two series: a sine with one violent spike, and a ramp
        rows = []
        base = ts("2024-01-01 00:00:00")
        import datetime

        for i in range(500):
            t = base + datetime.timedelta(minutes=10 * i)
            v = math.sin(i / 10.0) * 10
            if i == 250:
                v = 500.0  # spike LTTB must keep
            rows.append(("sine", t, v))
            rows.append(("ramp", t, float(i)))
        df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
        out = lttb_downsample(df, ["key"], "ts", "v", 40)
        got = {
            k: sorted((r.ts, r.v) for r in out.collect() if r.key == k)
            for k in ("sine", "ramp")
        }
        for key in ("sine", "ramp"):
            series = sorted((t, v) for (k, t, v) in rows if k == key)
            xs = [t.timestamp() for t, _ in series]
            ys = [v for _, v in series]
            want = [(series[i][0], series[i][1])
                    for i in lttb_select_indices(xs, ys, 40)]
            assert got[key] == sorted(want), key
            assert len(got[key]) == 40
        # the spike survives downsampling
        assert any(v == 500.0 for _, v in got["sine"])
        # first/last points always kept
        assert got["ramp"][0][1] == 0.0 and got["ramp"][-1][1] == 499.0

    def test_fixed_point_mode_matches_integer_reference(self, spark):
        # r7 oracle mode: value_scale=100 must select exactly the
        # indices the shared reference picks on integer (micros,
        # cents) coordinates — the engine-portability contract.
        import datetime

        from chrono_ts_spark.operators.lttb import (
            lttb_downsample,
            lttb_select_indices,
        )

        base = ts("2024-01-01 00:00:00")
        rows = [
            ("a", base + datetime.timedelta(minutes=7 * i),
             round(((i * 137) % 991) / 100.0 + (50.0 if i == 100 else 0.0), 2))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
        got = sorted(
            (r.ts, r.v)
            for r in lttb_downsample(df, ["key"], "ts", "v", 30, value_scale=100)
            .collect()
        )
        series = sorted((t, v) for (_, t, v) in rows)
        xs = [int(t.timestamp() * 1_000_000) for t, _ in series]
        ys = [int(round(v * 100)) for _, v in series]
        want = sorted(
            (series[i][0], series[i][1]) for i in lttb_select_indices(xs, ys, 30)
        )
        assert got == want
        assert len(got) == 30
        assert any(v > 50 for _, v in got)  # the planted spike survives


def test_scd2_collapses_and_versions(spark):
    from chrono_ts_spark.operators.scd import scd2
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a a b b a  -> runs a(v1) b(v2) a(v3)
        (1, t0 + dt.timedelta(minutes=0), "a"),
        (1, t0 + dt.timedelta(minutes=1), "a"),
        (1, t0 + dt.timedelta(minutes=2), "b"),
        (1, t0 + dt.timedelta(minutes=3), "b"),
        (1, t0 + dt.timedelta(minutes=4), "a"),
        # user 2: single observation, incl. a null attr run
        (2, t0, None),
        (2, t0 + dt.timedelta(minutes=1), None),
        (2, t0 + dt.timedelta(minutes=2), "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, state string")
    out = scd2(df, keys=["user_id"], attrs=["state"], ts_col="ts")
    got = sorted(
        ((r.user_id, r.version, r.state, r.effective_from, r.effective_to, r.is_current)
         for r in out.collect())
    )
    u1 = [g for g in got if g[0] == 1]
    assert [(g[1], g[2]) for g in u1] == [(1, "a"), (2, "b"), (3, "a")]
    # contiguity: each version ends where the next begins; last is open
    for a, b in zip(u1, u1[1:]):
        assert a[4] == b[3]
    assert u1[-1][4] is None and u1[-1][5] == 1
    assert sum(g[5] for g in u1) == 1
    # null attrs collapse null-safely into one run
    u2 = [g for g in got if g[0] == 2]
    assert [(g[1], g[2]) for g in u2] == [(1, None), (2, "x")]


def test_cusum_detects_level_shift(spark):
    from chrono_ts_spark.operators.changepoint import cusum
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # series A: 50 stationary points alternating 9/11 (mean pulled to 11
    # by the burst), then a 10-point burst at 16 -> upward alarm shortly
    # after rn=50; series B constant -> never alarms. The baseline is
    # the retrospective global mean, so the quiet half must stay inside
    # slack+threshold by construction.
    rows = []
    for i in range(60):
        v = (9.0 if i % 2 == 0 else 11.0) if i < 50 else 16.0
        rows.append((1, t0 + dt.timedelta(minutes=i), v))
        rows.append((2, t0 + dt.timedelta(minutes=i), 5.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = cusum(df, keys=["user_id"], ts_col="ts", value_col="value",
                k_sigma=0.5, h_sigma=4.0)
    a = sorted((r.rn, r.alarm, r.s_plus, r.s_minus) for r in out.collect()
               if r.user_id == 1)
    b = [r for r in out.collect() if r.user_id == 2]
    first_alarm = next(rn for rn, al, _, _ in a if al == 1)
    assert 50 < first_alarm <= 56  # fires shortly after the burst
    # before the burst the chart stays quiet
    assert all(al == 0 for rn, al, _, _ in a if rn <= 50)
    # reset: the row after an alarm starts from 0 (s stats smaller than
    # at the alarm row)
    alarm_rows = [rn for rn, al, _, _ in a if al == 1]
    for rn in alarm_rows:
        if rn < 60:
            s_alarm = a[rn - 1][2]
            s_next = a[rn][2]
            assert s_next < s_alarm
    assert all(r.alarm == 0 for r in b)
    assert all(r.s_plus == 0.0 and r.s_minus == 0.0 for r in b)


def test_cusum_matches_pure_python(spark):
    from chrono_ts_spark.operators.changepoint import cusum
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    vals = [3.0, 7.5, 2.25, 9.0, 1.5, 8.25, 0.75, 6.0, 12.0, 2.0]
    rows = [(1, t0 + dt.timedelta(seconds=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.rn: r for r in cusum(df, ["user_id"], "ts", "value",
                                  k_sigma=0.25, h_sigma=1.0).collect()}

    # reference: identical arithmetic, decimal-exact mu/sigma
    from decimal import Decimal
    import math
    dvals = [Decimal(str(v)) for v in vals]
    mu = float(sum(dvals)) / len(vals)
    ex2 = float(sum(d * d for d in dvals)) / len(vals)
    sigma = math.sqrt(max(0.0, ex2 - mu * mu))
    slack, h = 0.25 * sigma, 1.0 * sigma
    sp = sm = 0.0
    for i, x in enumerate(vals, start=1):
        sp = max(0.0, sp + ((x - mu) - slack))
        sm = max(0.0, sm + ((mu - x) - slack))
        alarm = 1 if (sp > h or sm > h) else 0
        r = out[i]
        assert (r.s_plus, r.s_minus, r.alarm) == (sp, sm, alarm), i
        if alarm:
            sp = sm = 0.0


def test_rollup_merge_exact_and_order_invariant(spark):
    from chrono_ts_spark.operators.rollup import (
        finalize,
        merge_states,
        partial_state,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=7 * i), "a" if i % 3 else "b",
         float((i * 37) % 100) / 4.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    full = finalize(
        partial_state(df, ["event_type"], "ts", "value", 3600), ["event_type"]
    )

    # split into 3 arbitrary batches; refresh in two different orders
    b = [df.filter(F.col("event_id") % 3 == i) for i in range(3)]
    p = [partial_state(x, ["event_type"], "ts", "value", 3600) for x in b]
    m1 = merge_states(merge_states(p[0], p[1], ["event_type"]), p[2], ["event_type"])
    m2 = merge_states(p[2], merge_states(p[1], p[0], ["event_type"]), ["event_type"])

    def rows_of(s):
        return sorted(
            (r.bucket_ts, r.event_type, r.n, r.sum_v, r.avg_v, r.min_v, r.max_v)
            for r in finalize(s, ["event_type"]).collect()
        )

    want = sorted(
        (r.bucket_ts, r.event_type, r.n, r.sum_v, r.avg_v, r.min_v, r.max_v)
        for r in full.collect()
    )
    assert rows_of(m1) == want
    assert rows_of(m2) == want


def test_salted_join_equals_plain_join(spark):
    from chrono_ts_spark.operators.salting import salted_join

    # heavily skewed big side: one key is 90% of rows
    rows = [("hot" if i % 10 else f"k{i % 7}", i) for i in range(5000)]
    big = spark.createDataFrame(rows, "k string, v long")
    small = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k3", 3), ("nomatch", 9)], "k string, d long"
    )
    got = sorted(
        (r.k, r.v, r.d)
        for r in salted_join(big, small, ["k"], salt=8, force_shuffle=True).collect()
    )
    want = sorted((r.k, r.v, r.d) for r in big.join(small, "k").collect())
    assert got == want and len(got) > 0

    # the hot key really spreads across shards
    from pyspark.sql import functions as F2
    spread = (
        big.withColumn(
            "__salt",
            F2.pmod(F2.xxhash64(F2.col("k"), F2.col("v")), F2.lit(8)).cast("int"),
        )
        .filter(F2.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_pagerank_star_and_mass(spark):
    from chrono_ts_spark.operators.pagerank import pagerank

    # star: center 0 connected to 1..6 (undirected)
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    e = [(0, i) for i in range(1, 7)] + [(i, 0) for i in range(1, 7)]
    edges = spark.createDataFrame(e, "src long, dst long")
    pr = {r.node: r.rank for r in pagerank(nodes, edges, iters=5).collect()}
    # center dominates; leaves identical by symmetry
    assert all(pr[0] > pr[i] for i in range(1, 7))
    leaf_vals = {pr[i] for i in range(1, 7)}
    assert len(leaf_vals) == 1
    # no dangling nodes: total mass stays ~1 (fixed-point floor loses
    # at most edges * 1e-18 per iteration)
    assert abs(sum(pr.values()) - 1.0) < 1e-9

"""Property-based tests (hypothesis) for algebraic invariants
(SURVEY.md §5.3)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chrono_ts_spark.operators import asof_join, gapfill

BASE = datetime(2024, 1, 1)

series = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=3600 * 20),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=series, right=series)
def test_asof_join_is_left_total(spark, left, right):
    """|asof(L,R)| == |L| regardless of inputs; match ts <= probe ts."""
    ldf = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), v, i) for i, (k, s, v) in enumerate(left)],
        "key string, ts timestamp, v double, id int",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), v) for (k, s, v) in right],
        "key string, ts timestamp, rv double",
    )
    out = asof_join(ldf, rdf, on=["key"], right_cols=["rv"]).collect()
    assert len(out) == len(left)
    for r in out:
        if r.ts_r is not None:
            assert r.ts_r <= r.ts


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series)
def test_gapfill_row_count_and_locf(spark, pts):
    """Gap-fill emits exactly keys×buckets rows; locf is null only
    before a key's first observation."""
    df = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), v) for (k, s, v) in pts],
        "key string, ts timestamp, v double",
    )
    n_keys = len({k for k, _, _ in pts})
    out = gapfill(
        df, ["key"], "ts", "v", 3600, "2024-01-01 00:00:00", "2024-01-01 23:00:00"
    ).collect()
    assert len(out) == n_keys * 24
    by_key: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.key, r.bucket_ts)):
        by_key.setdefault(r.key, []).append(r)
    for rows in by_key.values():
        seen = False
        for r in rows:
            if r.value is not None:
                seen = True
            assert (r.value_locf is not None) == seen


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(probes=series, builds=series)
def test_left_range_join_matches_naive(spark, probes, builds):
    """Bucketed left range join == naive inequality left join on any
    input: same pairs, zero-preserving, no duplicates."""
    from pyspark.sql import functions as F

    from chrono_ts_spark.operators.rangejoin import range_join

    pdf = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), i) for i, (k, s, _) in enumerate(probes)],
        "key string, ts timestamp, pid int",
    )
    bdf = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), v) for (k, s, v) in builds],
        "key string, bts timestamp, bv double",
    )
    got = sorted(
        (r.pid, r.bts, r.bv)
        for r in range_join(
            pdf, bdf, on=["key"], probe_ts="ts", build_ts="bts",
            lookback_seconds=600, how="left", probe_id="pid",
        ).collect()
    )
    want = []
    for i, (k, s, _) in enumerate(probes):
        matches = [
            (i, BASE + timedelta(seconds=bs), bv)
            for (bk, bs, bv) in builds
            if bk == k and s - 600 < bs <= s
        ]
        want.extend(matches if matches else [(i, None, None)])
    assert got == sorted(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lhs=series, rhs=series)
def test_interval_join_matches_naive(spark, lhs, rhs):
    """Canonical-bucket interval join == naive overlap join, each pair
    exactly once (multiset equality)."""
    from chrono_ts_spark.operators.rangejoin import interval_join

    # interval = [start, start + len] with len derived from the float
    ldf = spark.createDataFrame(
        [
            (k, BASE + timedelta(seconds=s),
             BASE + timedelta(seconds=s + int(abs(v) * 30)), i)
            for i, (k, s, v) in enumerate(lhs)
        ],
        "key string, ls timestamp, le timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [
            (k, BASE + timedelta(seconds=s),
             BASE + timedelta(seconds=s + int(abs(v) * 30)), j)
            for j, (k, s, v) in enumerate(rhs)
        ],
        "key string, rs timestamp, re timestamp, rid int",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            ldf, rdf, on=["key"], left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_seconds=600,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (lk, ls_, lv) in enumerate(lhs)
        for j, (rk, rs_, rv) in enumerate(rhs)
        if lk == rk
        and ls_ <= rs_ + int(abs(rv) * 30)
        and rs_ <= ls_ + int(abs(lv) * 30)
    )
    assert got == want


salted_rows = st.lists(
    st.tuples(
        st.sampled_from(["x", "y", "z"]),
        st.floats(min_value=-1000, max_value=1000, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=salted_rows)
def test_salted_agg_bit_identical_to_plain(spark, rows):
    """Salting must never change any output bit (exact partial states)."""
    from pyspark.sql import functions as F

    from chrono_ts_spark.functions import dsum
    from chrono_ts_spark.operators.salting import salted_agg

    df = spark.createDataFrame(rows, "k string, v double")
    salted = salted_agg(
        df, keys=["k"], salt=7, sums_decimal={"v": (18, 6)},
        count_alias="n", min_cols=["v"], max_cols=["v"],
    )
    plain = df.groupBy("k").agg(
        dsum("v").alias("sum_v"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    cols = ["k", "sum_v", "n", "min_v", "max_v"]
    assert sorted(map(tuple, salted.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


doc_corpus = st.lists(
    st.lists(
        st.sampled_from(["the", "a", "w1", "w2", "w3", "w4"]),
        min_size=0, max_size=12,
    ),
    min_size=1, max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_corpus)
def test_inverted_index_sharding_is_lossless(spark, texts):
    """r6 invariant: the md5-sharded index carries exactly the same
    (token → posting set) as a 1-shard build, per-shard lists are
    sorted, and df equals the merged posting count."""
    from chrono_ts_spark.queries.text import inverted_index

    d = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    sharded = inverted_index(d, n_shards=4, min_df=1).collect()
    flat = inverted_index(d, n_shards=1, min_df=1).collect()
    merged: dict = {}
    for r in sharded:
        assert r.postings == sorted(r.postings)
        assert r.df_shard == len(r.postings)
        merged.setdefault(r.token, []).extend(r.postings)
    assert {t: sorted(v) for t, v in merged.items()} == {
        r.token: list(r.postings) for r in flat
    }
    dfs = {r.token: r.df for r in sharded}
    assert dfs == {r.token: r.df for r in flat}


events_for_m4 = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3 * 900 - 1),  # seconds, 3 buckets
        st.floats(min_value=-50, max_value=50, allow_nan=False),
    ),
    min_size=1, max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=events_for_m4)
def test_m4_envelope_and_count(spark, pts):
    """r6 invariant: per bucket, v_min <= {v_first, v_last} <= v_max,
    witnesses lie inside the bucket, and n_events sums to the input."""
    import pathlib
    import tempfile

    from chrono_ts_spark.queries import load_all

    reg = load_all()
    tmp = pathlib.Path(tempfile.mkdtemp())
    rows = [
        (i + 1, BASE + timedelta(seconds=s), 1, "a", v, "{}")
        for i, (s, v) in enumerate(pts)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    out = reg["ts_m4_downsample"].fn(spark, str(tmp)).collect()
    assert sum(r.n_events for r in out) == len(pts)
    for r in out:
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max
        b0 = datetime.strptime(r.bucket_ts, "%Y-%m-%d %H:%M:%S")
        for w in (r.t_first, r.t_min, r.t_max, r.t_last):
            dt = datetime.strptime(w, "%Y-%m-%d %H:%M:%S")
            assert b0 <= dt < b0 + timedelta(seconds=900)
        assert r.t_first <= r.t_last


# ---------------------------------------------------------------------------
# Late-r6 operator invariants (pure-Python cores, so hypothesis can
# hammer them without a Spark job per example)
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=60),
    band=st.integers(min_value=0, max_value=10),
)
def test_dtw_symmetry_and_identity(xs, band):
    """DTW(a,b) == DTW(b,a); DTW(a,a) == 0; non-negative."""
    import numpy as np

    from chrono_ts_spark.operators.dtw import dtw_banded

    a = np.array(xs, dtype=np.int64)
    b = np.array(list(reversed(xs)), dtype=np.int64)
    dab = dtw_banded(a, b, band)
    dba = dtw_banded(b, a, band)
    assert dab == dba
    assert dtw_banded(a, a.copy(), band) == 0
    assert dab >= -1  # -1 only for band disconnect (equal lengths: never)
    assert dab >= 0


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.integers(min_value=-500, max_value=500), min_size=3, max_size=40),
    beta=st.sampled_from([5.0, 50.0, 500.0]),
)
def test_pelt_partition_validity_and_optimality(xs, beta):
    """PELT breakpoints form a valid partition and the objective equals
    the unpruned optimum (imported from its own test module)."""
    import numpy as np

    from chrono_ts_spark.operators.changepoint import pelt_l2
    from tests.test_r6b_ops import _opt_segmentation_bruteforce

    cps = pelt_l2(xs, beta)
    assert cps == sorted(set(cps))
    assert all(0 < c < len(xs) for c in cps)
    assert cps == _opt_segmentation_bruteforce(xs, beta)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day index
            st.integers(min_value=0, max_value=5),  # user
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rolling_actives_bounds_pure(days):
    """WAU bounds, checked on a pure-Python twin of the dedup-explode
    shape: dau(d) <= wau(d) <= sum of the window's daus; wau equals
    distinct union of the window's user sets."""
    pairs = set(days)
    by_day = {}
    for d, u in pairs:
        by_day.setdefault(d, set()).add(u)
    for d, users in by_day.items():
        window = [by_day.get(x, set()) for x in range(d - 6, d + 1)]
        wau = set().union(*window)
        dau = users
        assert dau <= wau
        assert len(wau) <= sum(len(w) for w in window)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.integers(min_value=-10000, max_value=10000), min_size=9, max_size=48
    ),
    a=st.sampled_from([1, 2, 5]),
    b=st.integers(min_value=-100, max_value=100),
)
def test_sax_affine_invariance_pure(vals, a, b):
    """SAX symbols are invariant under positive affine transforms of the
    series (z-normalization cancels scale and shift) — checked on the
    pure-Python reference twin of ts_sax_symbols."""
    from tests.test_r6b_ops import _sax_reference

    if len(set(vals)) < 2:
        return  # zero variance: both sides drop the series
    base = _sax_reference([v / 100 for v in vals])
    scaled = _sax_reference([(a * v + b) / 100 for v in vals])
    for (_, zb, sb), (_, zs, ss) in zip(base.values(), scaled.values()):
        # exact in real arithmetic; float sqrt can move z by an ulp, so
        # tolerate a symbol flip only when z sits ON a breakpoint
        if ss != sb:
            assert min(abs(abs(zb) - 0.6745), abs(zb)) < 1e-5, (zb, zs, sb, ss)
        else:
            assert abs(zb - zs) < 1e-4


# ---------------------------------------------------------------------------
# r7: LTTB fixed-point selection invariants (pure reference — no Spark,
# so examples are cheap) and repeated-span structure
# ---------------------------------------------------------------------------

int_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),       # x offset (micros)
        st.integers(min_value=-50_000, max_value=50_000),  # y cents
    ),
    min_size=0,
    max_size=120,
)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=int_series, n_out=st.integers(min_value=3, max_value=40))
def test_lttb_selection_shape_invariants(pts, n_out):
    """Kept indices: strictly increasing, first=0, last=n-1, exactly
    min(n_out, n) of them (pass-through below the threshold)."""
    from chrono_ts_spark.operators.lttb import lttb_select_indices

    pts = sorted(set(pts))
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    n = len(xs)
    idx = lttb_select_indices(xs, ys, n_out)
    if n_out >= n or n <= 2:
        assert idx == list(range(n))
        return
    assert idx[0] == 0 and idx[-1] == n - 1
    assert idx == sorted(set(idx))
    assert len(idx) == n_out


@settings(max_examples=150, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=int_series,
    n_out=st.integers(min_value=3, max_value=30),
    x_shift=st.integers(min_value=0, max_value=10**12),
    scale=st.integers(min_value=1, max_value=1000),
)
def test_lttb_selection_affine_invariant(pts, n_out, x_shift, scale):
    """The span-scaled integer area makes selection EXACTLY invariant
    under x translation and positive x/y scaling — the property that
    lets the oracle use epoch micros while magnitudes stay bounded."""
    from chrono_ts_spark.operators.lttb import lttb_select_indices

    pts = sorted(set(pts))
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    base = lttb_select_indices(xs, ys, n_out)
    shifted = lttb_select_indices(
        [scale * (x + x_shift) for x in xs], [scale * y for y in ys], n_out
    )
    assert base == shifted


doc_words = st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(8)]), min_size=0, max_size=40),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=doc_words)
def test_repeated_spans_structure(spark, docs, tmp_path_factory):
    """Every emitted span: length >= K, bounds consistent, inside the
    doc, non-overlapping within a doc, and its first window genuinely
    occurs in >= 2 documents."""
    from chrono_ts_spark.queries import load_all
    from chrono_ts_spark.queries.text import _SPAN_K

    reg = load_all()
    tmp = tmp_path_factory.mktemp("spans")
    rows = [
        (i, " ".join(ws), "en", "s", len(" ".join(ws)))
        for i, ws in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    out = reg["doc_repeated_spans"].fn(spark, str(tmp)).collect()
    toks = {i: ws for i, ws in enumerate(docs)}
    by_doc: dict[int, list] = {}
    for r in out:
        assert r.span_tokens >= _SPAN_K
        assert r.span_end - r.span_start + 1 == r.span_tokens
        assert 1 <= r.span_start and r.span_end <= len(toks[r.doc_id])
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        # the first window of the span occurs in some OTHER doc too
        w = toks[r.doc_id][r.span_start - 1 : r.span_start - 1 + _SPAN_K]
        others = sum(
            1
            for j, ws in toks.items()
            if any(ws[p : p + _SPAN_K] == w for p in range(len(ws) - _SPAN_K + 1))
        )
        assert others >= 2, (r, w)
    for _, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 < s2  # maximal spans cannot overlap or abut-merge

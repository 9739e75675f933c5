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

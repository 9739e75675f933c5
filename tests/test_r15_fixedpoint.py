"""r15 optimization round: int64 fixed-point aggregation twins.

Pins the two load-bearing claims from functions/__init__.py:

1. PRECONDITION — every fixture money/value column the converted
   queries aggregate is exactly representable at its fixed-point
   scale (x == double(rint(x*10^s))/10^s). If a future fixture regen
   ever breaks this, these tests fail before the driver's oracle does.
2. EQUIVALENCE — fsum/favg/fx_double produce BIT-IDENTICAL doubles to
   the decimal forms they replaced, on the real fixture data and on a
   crafted worst-case domain (values near the 2^53 double-rounding
   cliff for the end conversion).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.catalog import load_table
from chrono_ts_spark.functions import (
    davg,
    dec,
    dsum,
    favg,
    fsum,
    fx,
    fx_double,
)

from conftest import SF_SMOKE


FIXTURE_DOMAINS = [
    ("lineitem", "l_quantity", 2),
    ("lineitem", "l_extendedprice", 2),
    ("lineitem", "l_discount", 2),
    ("lineitem", "l_tax", 2),
    ("events", "value", 6),
    ("orders", "o_totalprice", 2),
    ("customer", "c_acctbal", 2),
]


@pytest.mark.parametrize("table,col,s", FIXTURE_DOMAINS)
def test_fixture_domain_conforms(spark, table, col, s):
    """Every aggregated value is exactly the double nearest m/10^s."""
    bad = (
        load_table(spark, SF_SMOKE, table)
        .filter(F.col(col).isNotNull())
        .filter(
            F.round(F.col(col) * F.lit(10**s), 0) / F.lit(float(10**s))
            != F.col(col)
        )
        .count()
    )
    assert bad == 0, f"{table}.{col} has values not exact at scale {s}"


def test_fsum_favg_bit_identical_on_fixture(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        dsum("l_extendedprice", 12, 2).alias("d_sum"),
        fsum("l_extendedprice", 2).alias("f_sum"),
        davg("l_quantity", 12, 2).alias("d_avg"),
        favg("l_quantity", 2).alias("f_avg"),
        F.sum(
            dec("l_extendedprice", 12, 2)
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
        )
        .cast("double")
        .alias("d_rev"),
        fx_double(
            F.sum(fx("l_extendedprice", 2) * (F.lit(100) - fx("l_discount", 2))),
            4,
        ).alias("f_rev"),
    ).collect()[0]
    assert row.d_sum.hex() == row.f_sum.hex()
    assert row.d_avg.hex() == row.f_avg.hex()
    assert row.d_rev.hex() == row.f_rev.hex()


def test_fx_double_past_2pow53(spark):
    """The end conversion must round ONCE (decimal divide), not twice
    (long→double→/10^s): sums past 2^53 are where the two diverge."""
    # 2^53 + 1 is not representable as a double; a sum of 10^-6 units
    # landing there must still convert to the correctly-rounded double
    # of the exact rational (9007199254740993 / 10^6).
    df = spark.createDataFrame(
        [(9007199254740992,), (1,)], "u long"
    ).agg(fx_double(F.sum("u"), 6).alias("v"))
    got = df.collect()[0].v
    # one correct rounding of the exact decimal, as decimal arithmetic does
    import decimal

    want = float(decimal.Decimal(9007199254740993) / decimal.Decimal(10**6))
    assert got.hex() == want.hex()
    # and the naive double path really would differ for THIS constant —
    # guard the guard (r16: asserted for real; the r15 form had a
    # vacuous `or True`). float(2^53+1) == 2^53, so the twice-rounded
    # path lands one ulp below the correctly-rounded exact rational.
    naive = float(9007199254740993) / 1e6
    assert naive.hex() != want.hex()


def test_gapfill_fixed_point_matches_decimal(spark):
    from chrono_ts_spark.operators.gapfill import gapfill

    ev = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id") < 5)
    kw = dict(
        keys=["user_id"],
        ts_col="ts",
        value_col="value",
        bucket_seconds=3600,
        start="2024-01-01 00:00:00",
        end="2024-01-03 00:00:00",
        agg="avg",
    )
    a = gapfill(ev, **kw).collect()
    b = gapfill(ev, fixed_point_scale=6, **kw).collect()
    key = lambda r: (r.user_id, r.bucket_ts)
    a.sort(key=key)
    b.sort(key=key)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for f in ("value", "value_locf", "value_interp"):
            va, vb = getattr(ra, f), getattr(rb, f)
            if va is None or vb is None:
                assert va is None and vb is None
            else:
                assert math.isclose(va, vb, rel_tol=0.0, abs_tol=0.0), (
                    key(ra),
                    f,
                    va,
                    vb,
                )

"""Bloom semi-join reduction: no false negatives, join equivalence,
actual reduction (SURVEY §5-style equivalence strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.operators.bloomjoin import (
    bloom_prefilter,
    bloom_prefilter_join,
)


@pytest.fixture(scope="module")
def fact(spark):
    # keys 0..9999 plus nulls and negatives; value payload
    rows = [(i % 10000, i) for i in range(30000)]
    rows += [(None, -1), (None, -2), (-5, -3), (-7, -4)]
    return spark.createDataFrame(rows, "fk long, v long")


@pytest.fixture(scope="module")
def dim(spark):
    # 150 selective keys incl. a negative one and a no-match key
    rows = [(k, f"d{k}") for k in range(0, 1500, 10)]
    rows += [(-5, "neg"), (123456789, "nomatch")]
    return spark.createDataFrame(rows, "dk long, name string")


def test_no_false_negatives(spark, fact, dim):
    reduced = bloom_prefilter(fact, dim, "fk", "dk", num_bits=1 << 12)
    kept = {r.v for r in reduced.collect()}
    true_keys = {r.dk for r in dim.collect()}
    for r in fact.collect():
        if r.fk in true_keys:
            assert r.v in kept, f"true match dropped: fk={r.fk}"


def test_join_equals_plain_join(spark, fact, dim):
    got = (
        bloom_prefilter_join(fact, dim, "fk", "dk", num_bits=1 << 12)
        .select("fk", "v", "dk", "name")
        .collect()
    )
    want = (
        fact.join(dim, fact.fk == dim.dk)
        .select("fk", "v", "dk", "name")
        .collect()
    )
    assert sorted(got) == sorted(want)
    # null fact keys never match in either shape
    assert all(r.fk is not None for r in got)


def test_reduction_is_real(spark, fact, dim):
    n_fact = fact.count()
    n_reduced = bloom_prefilter(fact, dim, "fk", "dk", num_bits=1 << 14).count()
    # 152 dim keys over 10k fact keys: a well-sized bloom keeps ~1.6%
    assert n_reduced < n_fact * 0.1
    assert n_reduced >= 3 * 150  # every true match survives


def test_undersized_bloom_still_exact(spark, fact, dim):
    """64 bits for 152 keys: huge FP rate, results still exact."""
    got = bloom_prefilter_join(fact, dim, "fk", "dk", num_bits=64).count()
    want = fact.join(dim, fact.fk == dim.dk).count()
    assert got == want


def test_outer_join_rejected(spark, fact, dim):
    with pytest.raises(ValueError):
        bloom_prefilter_join(fact, dim, "fk", "dk", how="left")

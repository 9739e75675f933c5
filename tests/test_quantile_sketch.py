"""KLL-style sketch: rank-error bound under several partitionings,
weight conservation, exactness when the sketch never compacts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.operators.quantile_sketch import kll_quantiles, sketch_items

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(3)
    xs = np.concatenate([rng.exponential(10.0, 40000), rng.normal(200, 5, 10000)])
    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    return df, np.sort(xs)


@pytest.mark.parametrize("partitions", [1, 8, 32])
def test_rank_error_bound(spark, skewed, partitions):
    df, xs = skewed
    n = len(xs)
    est = {
        r.q: r.estimate
        for r in kll_quantiles(
            df.repartition(partitions), "v", QS, capacity=200
        ).collect()
    }
    for q in QS:
        rank = np.searchsorted(xs, est[q], side="right")
        # capacity 200 over 50k values: generous 2% rank-error margin
        assert abs(rank - q * n) <= 0.02 * n, (q, rank / n)


def test_weight_conservation(spark, skewed):
    df, xs = skewed
    total = (
        sketch_items(df.repartition(8), "v", capacity=200)
        .agg(F.sum("weight").alias("w"))
        .collect()[0]
        .w
    )
    assert total == len(xs)


def test_exact_when_uncompacted(spark):
    xs = [float(i) for i in range(100)]
    df = spark.createDataFrame([(x,) for x in xs], "v double").coalesce(1)
    est = {r.q: r.estimate for r in kll_quantiles(df, "v", [0.5, 0.9], capacity=512).collect()}
    # no compaction ever happened: the sketch IS the data set
    assert est[0.5] == 49.0  # smallest v with rank >= 50
    assert est[0.9] == 89.0

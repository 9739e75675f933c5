"""Z-order layout: interleave correctness and the actual pruning
benefit (per-file ranges shrink on BOTH interleaved dimensions vs a
random layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.operators.zorder import (
    interleave_bits,
    with_zvalue,
    zorder_write,
)


def test_interleave_known_bits(spark):
    # x=0b11, y=0b01 at 2 bits -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3
    #                               = 1 | 2 | 4 | 0 = 7
    df = spark.createDataFrame([(3, 1)], "x int, y int")
    out = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    assert out[0].z == 7


def test_interleave_width_guard(spark):
    df = spark.createDataFrame([(1, 1)], "x int, y int")
    with pytest.raises(ValueError):
        df.select(interleave_bits([F.col("x"), F.col("y")], bits=32))


def test_zvalue_monotone_in_each_dim(spark):
    # fixing one dimension, z grows with the other (within quantization)
    rows = [(i, float(i), 0.0) for i in range(256)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    z = {r.id: r.zval for r in with_zvalue(df, ["x", "y"], bits=8).collect()}
    vals = [z[i] for i in range(256)]
    assert vals == sorted(vals)
    assert len(set(vals)) == 256


def test_layout_shrinks_file_ranges(spark, tmp_path):
    # two independent uniform dims; z-ordered files must each cover a
    # small sub-rectangle, a ts-sorted layout only helps dim x
    import numpy as np

    rng = np.random.default_rng(0)
    n = 20000
    xs, ys = rng.uniform(0, 1, n), rng.uniform(0, 1, n)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    ).repartition(8)

    zpath = str(tmp_path / "zorder")
    zorder_write(df, ["x", "y"], zpath, num_files=16, bits=8)

    back = spark.read.parquet(zpath).withColumn(
        "f", F.input_file_name()
    )
    ranges = back.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("rx"),
        (F.max("y") - F.min("y")).alias("ry"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    assert len(ranges) >= 8  # actually produced multiple files
    avg_rx = sum(r.rx for r in ranges) / len(ranges)
    avg_ry = sum(r.ry for r in ranges) / len(ranges)
    # 16 files over a 2D z-curve: each covers ~1/4 of each dimension;
    # a random layout would give ~1.0 on both
    assert avg_rx < 0.6 and avg_ry < 0.6, (avg_rx, avg_ry)

    # file skipping: a 0.1-wide predicate on either dim overlaps a
    # minority of files
    per_file = back.groupBy("f").agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).collect()
    # band placed inside one z-curve quadrant (a band straddling the
    # 0.5 split is the adversarial case and overlaps ~2x more files)
    x_hits = sum(1 for r in per_file if r.x0 <= 0.15 and r.x1 >= 0.10)
    y_hits = sum(1 for r in per_file if r.y0 <= 0.15 and r.y1 >= 0.10)
    assert x_hits <= len(per_file) / 2
    assert y_hits <= len(per_file) / 2

"""r15 optimization round: ADVICE r14 loud-failure guards.

The int64 fixed-point partial-sum trainers (clustering/ivf/pq) and the
driver-side LSH probe-bucket table both had documented silent-wrap
edges outside their operating envelopes (ADVICE r14, all low): batch
sums could wrap int64 if a caller raised the Arrow batch size or fed
large-magnitude embeddings, and n_planes >= 32 would overflow the
IntegerType bucket id on the driver side while the corpus side wrapped
via astype(np.int32). Both now fail loudly; these tests pin that.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chrono_ts_spark.operators.clustering import guard_int64_partials


class TestGuardInt64Partials:
    def test_normal_batch_passes_through(self):
        q = np.round(np.random.default_rng(0).normal(size=(2000, 64)) * 1e9).astype(
            np.int64
        )
        out = guard_int64_partials(q)
        assert out is q  # identity, no copy

    def test_empty_and_zero_batches_pass(self):
        assert guard_int64_partials(np.zeros((0, 64), dtype=np.int64)).shape == (0, 64)
        assert guard_int64_partials(np.zeros((10, 64), dtype=np.int64)).shape == (10, 64)

    def test_wrap_risk_raises(self):
        # A batch whose worst-case single-cell sum exceeds 2^62:
        # rows * max|q| = 1000 * 2^60 >> 2^62.
        q = np.full((1000, 4), 1 << 60, dtype=np.int64)
        with pytest.raises(OverflowError, match="fixed-point partial sums"):
            guard_int64_partials(q)

    def test_boundary_is_conservative(self):
        # rows=2, max=2^61: worst case 2^62 exactly -> len(q) > 2^62//qmax
        # is False only when rows*qmax <= 2^62; 2 > 2 is False, passes.
        q = np.full((2, 1), 1 << 61, dtype=np.int64)
        guard_int64_partials(q)
        # One more row crosses the line and raises.
        q3 = np.full((3, 1), 1 << 61, dtype=np.int64)
        with pytest.raises(OverflowError):
            guard_int64_partials(q3)


class TestLshPlaneWidthGuard:
    def test_n_planes_over_31_raises(self, spark):
        from chrono_ts_spark.operators.similarity import lsh_bucket_topk

        df = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(8)],
            "vec_id long, embedding array<float>",
        )
        probes = df.filter(F.col("vec_id") < 2)
        with pytest.raises(ValueError, match="n_planes=32"):
            lsh_bucket_topk(df, probes, dims=2, k=3, n_planes=32)

    def test_31_planes_still_runs(self, spark):
        from chrono_ts_spark.operators.similarity import lsh_bucket_topk

        df = spark.createDataFrame(
            [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(30)],
            "vec_id long, embedding array<float>",
        )
        probes = df.filter(F.col("vec_id") < 2)
        out = lsh_bucket_topk(
            df, probes, dims=3, k=3, n_planes=31, n_tables=2
        ).collect()
        assert len(out) > 0

"""Round-11 guard tests: the DOULION sparsified triangle estimator
(the implemented scale swap for rel_triangle_parts — VERDICT r10
item 2) and its reduction to the exact enumerator at p=1.
"""

from __future__ import annotations

from chrono_ts_spark.queries import load_all

REG = load_all()

SF = "/root/testdata/sf0.001"


def _coorder_edges(spark):
    from pyspark.sql import functions as F

    from chrono_ts_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )


class TestPlanInfo:
    """planinfo = the public replacement for private plan access
    (VERDICT r10 item 4): section extraction and the EXPLAIN COST
    size parse must agree with Catalyst's own rendering."""

    def test_sections_and_cost_size(self, spark):
        from chrono_ts_spark.catalog import load_table
        from chrono_ts_spark.planinfo import (
            analyzed_plan,
            optimized_plan,
            optimized_plan_size_bytes,
        )

        li = load_table(spark, SF, "lineitem")
        df = li.select("l_partkey", "l_extendedprice").filter(
            "l_extendedprice > 100"
        )
        opt = optimized_plan(df)
        ana = analyzed_plan(df)
        assert "Project" in opt and "Relation" in opt
        assert "l_partkey" in ana
        size = optimized_plan_size_bytes(df)
        assert size is not None and size > 0

    def test_size_unit_parse(self):
        from chrono_ts_spark.planinfo import _SIZE_RE, _SIZE_UNITS

        m = _SIZE_RE.search("Statistics(sizeInBytes=24.3 GiB, rowCount=5)")
        assert m is not None
        assert int(float(m.group(1)) * _SIZE_UNITS[m.group(2)]) == int(
            24.3 * (1 << 30)
        )
        assert _SIZE_RE.search("sizeInBytes=1616.0 B").group(2) == "B"


class TestDoulionTriangles:
    def test_p1_reduces_to_exact_enumerator(self, spark):
        # keep_num == keep_den keeps every edge: the DOULION path IS
        # the exact degree-oriented enumerator, so its per-corner
        # counts must equal rel_triangle_parts corner for corner.
        from chrono_ts_spark.operators.graph import doulion_triangle_counts

        exact = {
            r.part_id: r.n_triangles
            for r in REG["rel_triangle_parts"].fn(spark, SF).collect()
        }
        full = {
            r.node: r.tri_sampled
            for r in doulion_triangle_counts(
                _coorder_edges(spark), 1, 1
            ).collect()
        }
        assert full == exact and len(exact) > 0

    def test_estimate_brackets_truth_at_fixture_scale(self, spark):
        # p=1/2 on the fixture graph: the deterministic estimate must
        # land within a loose envelope of the exact global count
        # (DOULION std err ~ sqrt((1/p^3 - 1)/T); T is in the
        # thousands here, so 50% is generous against fixture regens)
        # and the sampled edge count near half the canonical edges.
        exact_total = (
            sum(
                r.n_triangles
                for r in REG["rel_triangle_parts"].fn(spark, SF).collect()
            )
            // 3
        )
        row = REG["rel_triangle_doulion"].fn(spark, SF).collect()[0]
        assert row.est_triangles == row.tri_sampled * 8
        assert 0.35 <= row.n_edges_kept / row.n_edges <= 0.65
        assert abs(row.est_triangles - exact_total) / exact_total < 0.5

    def test_sampler_rejects_bad_probability(self):
        import pytest
        from chrono_ts_spark.operators.graph import doulion_triangle_counts

        with pytest.raises(ValueError):
            doulion_triangle_counts(None, 0, 2)
        with pytest.raises(ValueError):
            doulion_triangle_counts(None, 3, 2)


class TestAbcDecimalHeadroom:
    def test_abc_classes_survive_e17_revenue_totals(self, spark, tmp_path):
        """The r11 400x probe (240M lineitem) found the ABC banding's
        bigint cross-multiplications overflowing: total*100 > 2^63
        once the e4 fixed-point revenue total passes ~9.2e16. Both
        rel_abc_analysis and rel_abc_xyz (and their oracles, in
        lockstep) now compare in DECIMAL(38,0). This corpus reproduces
        the overflow regime with 2,000 max-price rows — the old bigint
        form raises ARITHMETIC_OVERFLOW on it; the decimal form must
        classify correctly."""
        import datetime

        import pandas as pd

        n = 2000
        li = pd.DataFrame(
            {
                "l_orderkey": range(n),
                "l_partkey": [i % 200 for i in range(n)],
                "l_suppkey": [1] * n,
                "l_linenumber": pd.array([1] * n, dtype="int32"),
                "l_quantity": [float(1 + i % 7) for i in range(n)],
                # max-ish price: rev_e4 ~ 1e14/row; 2000 rows -> ~2e17
                # total, past the 9.2e18/100 bigint comparison ceiling
                "l_extendedprice": [9_999_999_999.0] * n,
                "l_discount": [0.0] * n,
                "l_tax": [0.0] * n,
                "l_returnflag": ["N"] * n,
                "l_linestatus": ["O"] * n,
                "l_shipdate": [datetime.datetime(2024, 1, 1)] * n,
            }
        )
        o = pd.DataFrame(
            {
                "o_orderkey": range(n),
                "o_custkey": [1] * n,
                "o_orderstatus": ["F"] * n,
                "o_totalprice": [1.0] * n,
                "o_orderdate": [
                    datetime.datetime(2024, 1 + (i % 12), 1) for i in range(n)
                ],
                "o_orderpriority": ["1-URGENT"] * n,
            }
        )
        li.to_parquet(tmp_path / "lineitem.parquet")
        o.to_parquet(tmp_path / "orders.parquet")

        from chrono_ts_spark.queries import load_all

        reg = load_all()
        abc = reg["rel_abc_analysis"].fn(spark, str(tmp_path)).collect()
        assert {r.abc_class for r in abc} <= {"A", "B", "C"}
        # equal-revenue parts: the first 80% of parts are A, to 95% B
        counts = {r.abc_class: r.n_parts for r in abc}
        assert counts == {"A": 160, "B": 30, "C": 10}
        grid = reg["rel_abc_xyz"].fn(spark, str(tmp_path)).collect()
        assert sum(r.n_parts for r in grid) == 200
        assert {r.abc_class for r in grid} <= {"A", "B", "C"}

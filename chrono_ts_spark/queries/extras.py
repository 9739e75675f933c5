"""Coverage long tail: cube, outer joins, window value functions, map
functions, approximate aggregates, sampling, CSV/JSON scans, the
partitioned batch sink, and the UDAF/UDTF surface
(SURVEY.md §2: S2, S5, A2, A5, J2, W-extra, O4, X1, X3, X4, map family).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import SCHEMAS, load_table
from ..functions import (
    davg,
    dsum,
    md5_u32,
    sql_dsum,
    sql_md5_u32,
    sql_time_bucket,
    sql_ts_str,
    time_bucket,
)
from ..operators.topk import top_k_per_group
from . import query

# ---------------------------------------------------------------------------
# A5: CUBE with sentinel totals
# ---------------------------------------------------------------------------


@query(
    "rel_cube_sales",
    oracle=f"""
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       {sql_dsum('o_totalprice', 12, 2)} AS total,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("relational", "A5"),
)
def rel_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) incl. all subtotal combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum("o_totalprice", 12, 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
        "total",
        "n",
    )


# ---------------------------------------------------------------------------
# J2: full outer join
# ---------------------------------------------------------------------------


@query(
    "rel_full_outer_balance",
    oracle=f"""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       {sql_dsum('c.c_acctbal', 12, 2)} AS cust_bal,
       {sql_dsum('s.s_acctbal', 12, 2)} AS supp_bal,
       COUNT(c.c_custkey) AS n_cust,
       COUNT(s.s_suppkey) AS n_supp
FROM customer c FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY COALESCE(c.c_nationkey, s.s_nationkey)
""",
    tags=("relational", "J2"),
)
def rel_full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER customer↔supplier by nation with per-side aggregates."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.groupBy(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey")
    ).agg(
        dsum("c_acctbal", 12, 2).alias("cust_bal"),
        dsum("s_acctbal", 12, 2).alias("supp_bal"),
        F.count("c_custkey").alias("n_cust"),
        F.count("s_suppkey").alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# W: first_value / last_value / nth_value over explicit frames
# ---------------------------------------------------------------------------


@query(
    "rel_window_values",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w_full AS last_price,
       nth_value(o_totalprice, 2) OVER w_full AS second_price
FROM orders
WINDOW
    w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("relational", "W"),
)
def rel_window_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value window functions with explicit frames."""
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
    )


# ---------------------------------------------------------------------------
# Map functions (compared via sorted entry arrays — portable)
# ---------------------------------------------------------------------------


@query(
    "sf_map_funcs",
    oracle="""
SELECT o_orderpriority,
       map_extract(m, 'F')[1] AS f_total,
       array_to_string(list_sort(map_keys(m)), ',') AS statuses,
       CAST(cardinality(m) AS INTEGER) AS n_statuses
FROM (
    SELECT o_orderpriority,
           map(list(o_orderstatus ORDER BY o_orderstatus),
               list(total ORDER BY o_orderstatus)) AS m
    FROM (
        SELECT o_orderpriority, o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus
    )
    GROUP BY o_orderpriority
)
""",
    tags=("scalar", "map"),
)
def sf_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build status→total maps, extract/keys/cardinality."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        dsum("o_totalprice", 12, 2).alias("total")
    )
    m = (
        per.groupBy("o_orderpriority")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("o_orderstatus", "total")))
            ).alias("m")
        )
    )
    return m.select(
        "o_orderpriority",
        # try_element_at: ANSI mode (Spark 4 default) makes plain
        # element_at throw MAP_KEY_DOES_NOT_EXIST when a priority group
        # has no 'F' orders; the oracle's map_extract returns NULL
        F.try_element_at("m", F.lit("F")).alias("f_total"),
        # Serialized: the driver canonicalizer can't hash raw arrays.
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("statuses"),
        F.size("m").alias("n_statuses"),
    )


# ---------------------------------------------------------------------------
# A2 approx / O4 sampling (rows-only: engine-specific algorithms)
# ---------------------------------------------------------------------------


@query("rel_approx_distinct", oracle=None, tags=("relational", "A2", "no-oracle"))
def rel_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx_count_distinct next to the exact count (sanity: ±5%).

    Rows-only: the HLL sketch layout/hash inside approx_count_distinct
    is engine-specific, so the approximate column has no cross-engine
    oracle; the exact column rides alongside and the ±5% envelope is
    asserted in pytest. rel_hll_md5 below is the fully-oracled twin of
    the same sketch over an engine-portable md5 hash family.

    Plan shape (r10): mixing the DISTINCT aggregate with the sketch in
    ONE agg forces Catalyst's Expand rewrite — partial aggregation is
    lost and every raw row ships to the |groups| final tasks (the r10
    probe measured 42.9-50.0 s over 30M rows with 3 groups). The
    decomposed form — sketch pass, exact pass as the classic two-level
    dedup-then-count (both map-side combinable, width-parallel), then
    a |groups|-row join — is the 100 TB plan: 4.0 s on the same probe,
    identical output. NULL keys (r11, ADVICE): countDistinct skips
    nulls, so the dedup pass filters l_partkey IS NOT NULL explicitly —
    without it a null key would count as one distinct value, an
    off-by-one the non-null fixture could never show."""
    li = load_table(spark, sf_dir, "lineitem")
    ap = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts")
    )
    ex = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_returnflag", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    return ap.join(ex, "l_returnflag")


# -- rel_hll_md5: the fully-oracled HyperLogLog twin of rel_approx_distinct
# (the doc_simhash_md5 pattern applied to the A2 sketch family). The HLL
# estimate is deterministic once the hash family is fixed: register index
# and rank come from an md5-derived 32-bit hash, the per-register MAX is
# addition-order-immune, and the harmonic indicator sum is kept as an
# EXACT scaled integer (2^(23-M) per register, 2^23 per empty register)
# so no float enters until the single closed-form division at the end —
# which both engines evaluate with the identical IEEE op sequence. The
# one libm call (ln in the small-range correction) quantizes through 1e6
# fixed point per docs/determinism.md. The register/estimate machinery
# lives in chrono_ts_spark.functions (HLL_*, hll_*/sql_hll_*) and
# generates the SAME CASE chains for the Spark and DuckDB sides, so the
# oracle is the algorithm, not a re-derivation; the rolling-window twin
# ts_rolling_actives_hll_md5 (timeseries.py) shares it verbatim.

from ..functions import (  # noqa: E402
    HLL_WBITS,
    HLL_WMOD,
    SQL_HLL_BITLEN,
    SQL_HLL_TERM,
    hll_estimate,
    hll_reg,
    hll_rho,
    hll_term,
    hll_w,
    sql_hll_estimate,
)


@query(
    "rel_hll_md5",
    oracle=f"""
WITH h AS (
    SELECT l_returnflag,
           {sql_md5_u32("CAST(l_partkey AS VARCHAR)")} AS h
    FROM lineitem
), rw AS (
    SELECT l_returnflag, (h >> {HLL_WBITS}) AS reg, (h % {HLL_WMOD}) AS w FROM h
), regs AS (
    SELECT l_returnflag, reg,
           MAX({HLL_WBITS + 1} - ({SQL_HLL_BITLEN})) AS m
    FROM rw GROUP BY l_returnflag, reg
), agg AS (
    SELECT l_returnflag,
           SUM({SQL_HLL_TERM}) AS s_used,
           COUNT(*) AS regs_used
    FROM regs GROUP BY l_returnflag
)
SELECT a.l_returnflag, x.exact_parts, a.regs_used,
       CAST(floor(({sql_hll_estimate("a.s_used", "a.regs_used")})
                  * 1000000.0 + 0.5) AS BIGINT) AS hll_fp
FROM agg a
JOIN (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
      FROM lineitem GROUP BY l_returnflag) x USING (l_returnflag)
""",
    tags=("relational", "A2", "sketch", "md5-twin"),
)
def rel_hll_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count per return flag, driver-hash-verifiable.

    The engine-portable twin of rel_approx_distinct: same sketch, but
    the hash family is md5 (available in both engines) instead of the
    JVM-private XxHash64 inside approx_count_distinct, so the WHOLE
    estimate — not just an envelope — is oracled. Shape at 100 TB: one
    map-side partial MAX per (flag, register) caps the first shuffle at
    n_flags x 1024 rows per partition regardless of row count; the
    second aggregation is n_flags x 1024 rows total. The exact
    countDistinct column rides alongside for the accuracy story (pytest
    gates the 4-sigma 13% envelope; 1.04/sqrt(1024) ~ 3.25% standard
    error, observed 0.8-1.7% across the three fixture SFs)."""
    li = load_table(spark, sf_dir, "lineitem")
    h = md5_u32(F.col("l_partkey").cast("string"))
    hashed = li.select(
        "l_returnflag", hll_reg(h).alias("reg"), hll_w(h).alias("w")
    )
    regs = hashed.groupBy("l_returnflag", "reg").agg(
        F.max(hll_rho(F.col("w"))).alias("m")
    )
    agg = regs.groupBy("l_returnflag").agg(
        F.sum(hll_term(F.col("m"))).alias("s_used"),
        F.count(F.lit(1)).alias("regs_used"),
    )
    fin = agg.select(
        "l_returnflag",
        "regs_used",
        F.floor(
            hll_estimate(F.col("s_used"), F.col("regs_used")) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("hll_fp"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return fin.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag", "exact_parts", "regs_used", "hll_fp"
    )


@query("rel_sample", oracle=None, tags=("relational", "O4", "no-oracle"))
def rel_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (seed semantics are engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


# ---------------------------------------------------------------------------
# S2: CSV / JSON scans (write a lossless temp copy, read it back, and
# aggregate — the oracle runs the same aggregate on the parquet view,
# so the check also proves the text roundtrip is exact)
# ---------------------------------------------------------------------------


_RUN_TOKEN = __import__("uuid").uuid4().hex[:8]  # per-process isolation


_SCRATCH_DIRS: set[str] = set()


def _cleanup_scratch() -> None:  # pragma: no cover - exercised at exit
    import shutil

    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


__import__("atexit").register(_cleanup_scratch)


def _roundtrip_dir(sf_dir: str, fmt: str, table: str) -> str:
    """Scratch dir for write-then-scan queries. Includes a per-process
    token so concurrent runs (pytest + bench + driver) can't overwrite
    each other's directories mid-read; every dir is registered for
    atexit removal so repeated sweep/bench/driver processes stop
    accumulating table copies in the temp volume (r7 review — the
    gov_forget_user fix, generalized). Lazy plans reading these dirs
    stay valid for the whole interpreter lifetime."""
    safe = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(
        tempfile.gettempdir(), f"chrono_{fmt}_{table}_{safe}_{_RUN_TOKEN}"
    )
    _SCRATCH_DIRS.add(path)
    return path


@query(
    "io_csv_scan",
    out_schema="p_brand string, total_price double, n bigint",
    oracle=f"""
SELECT p_brand, {sql_dsum('p_retailprice', 12, 2)} AS total_price, COUNT(*) AS n
FROM part GROUP BY p_brand
""",
    tags=("io", "S2"),
)
def io_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan: parquet→CSV→scan with declared schema→aggregate."""
    path = _roundtrip_dir(sf_dir, "csv", "part")
    load_table(spark, sf_dir, "part").write.mode("overwrite").option(
        "header", True
    ).csv(path)
    df = spark.read.schema(SCHEMAS["part"]).option("header", True).csv(path)
    return df.groupBy("p_brand").agg(
        dsum("p_retailprice", 12, 2).alias("total_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "io_json_scan",
    out_schema="s_nationkey int, total_bal double, n bigint",
    oracle=f"""
SELECT s_nationkey, {sql_dsum('s_acctbal', 12, 2)} AS total_bal, COUNT(*) AS n
FROM supplier GROUP BY s_nationkey
""",
    tags=("io", "S2"),
)
def io_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with declared schema."""
    path = _roundtrip_dir(sf_dir, "json", "supplier")
    load_table(spark, sf_dir, "supplier").write.mode("overwrite").json(path)
    df = spark.read.schema(SCHEMAS["supplier"]).json(path)
    return df.groupBy("s_nationkey").agg(
        dsum("s_acctbal", 12, 2).alias("total_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "io_partitioned_sink",
    out_schema="day string, event_type string, n bigint",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
    tags=("io", "S5"),
)
def io_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: write events partitioned by date (the at-rest layout from
    docs/scale.md), scan it back, count per partition — proves
    partition values survive the hive-style directory encoding."""
    path = _roundtrip_dir(sf_dir, "parquet_part", "events")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(path)
    back = spark.read.parquet(path)
    # partition-column type inference may read `day` back as DATE;
    # normalize to the string form the oracle produces
    return back.groupBy(
        F.col("day").cast("string").alias("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# X1/X3: scalar pandas UDF + grouped-agg pandas UDAF
# ---------------------------------------------------------------------------


@query(
    "udaf_median_price",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
       round(CAST(SUM(CAST(abs(l_extendedprice - 51000.0) AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_abs_dev
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udf", "X3"),
)
def udaf_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF (median) + scalar pandas UDF (abs dev)."""
    from pyspark.sql.functions import pandas_udf

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("double")
    def abs_dev(v: pd.Series) -> pd.Series:
        return (v - 51000.0).abs()

    li = load_table(spark, sf_dir, "lineitem")
    # Spark disallows mixing pandas UDAFs with built-in aggregates in
    # one agg(); run them as two aggregations joined on the group key.
    med = li.groupBy("l_returnflag").agg(
        F.round(median_udaf("l_extendedprice"), 6).alias("median_price")
    )
    # davg, not F.avg: raw-double partial sums combine in partition
    # order and can land on a different 6th decimal than DuckDB's
    # sequential AVG (r7 review; the registry's decimal-exact
    # contract). dev is cents-exact, so DECIMAL(12,2) carries it.
    dev = (
        li.withColumn("dev", abs_dev("l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(F.round(davg("dev", 12, 2), 6).alias("avg_abs_dev"))
    )
    return med.join(dev, "l_returnflag")


# ---------------------------------------------------------------------------
# X4: UDTF — explode documents into word bigrams
# ---------------------------------------------------------------------------


@query(
    "udtf_bigrams",
    oracle=r"""
SELECT bigram, COUNT(*) AS n
FROM (
    SELECT unnest(list_transform(
        generate_series(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM (
        SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 50
    )
)
GROUP BY bigram
""",
    tags=("udf", "X4"),
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF emitting word bigrams per document, then counted.

    The UDTF (lateral-join table function) is the X4 surface; the
    equivalent exists as pure HOFs too — the UDTF form exists for
    logic that genuinely needs imperative Python per row.
    """
    from pyspark.sql.functions import lit, udtf

    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            import re

            # ASCII whitespace split, matching the oracle's RE2 '\\s+'
            # and the Java-regex tokenizer the text queries use —
            # Python's unicode-aware str.split() also breaks on NBSP
            # etc., diverging on non-ASCII whitespace (r7 review)
            toks = [
                t for t in re.split("[ \t\n\r\x0b\f]+", (text or "").lower()) if t
            ]
            for a, b in zip(toks, toks[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("bigrams_udtf", Bigrams)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT b.bigram, COUNT(*) AS n
        FROM __udtf_docs d, LATERAL bigrams_udtf(d.text) b
        GROUP BY b.bigram
        """
    )


# ---------------------------------------------------------------------------
# X2: grouped-map applyInPandas — per-user OLS trend of value over time
# ---------------------------------------------------------------------------


@query(
    "udf_grouped_trend",
    oracle="""
SELECT user_id,
       CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_per_hour
FROM (
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE) / 3600000000.0 AS DECIMAL(18,9))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE) / 3600000000.0 AS DECIMAL(18,9))
                    * CAST(CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE) / 3600000000.0 AS DECIMAL(18,9))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE) / 3600000000.0 AS DECIMAL(18,9))
                    * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sxy
    FROM events
    GROUP BY user_id
)
WHERE n >= 2
""",
    tags=("udf", "X2"),
)
def udf_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user OLS slope (value per hour).

    The pandas side reproduces the decimal-exact oracle arithmetic:
    hours are quantized to 9 decimals (== the SQL DECIMAL(18,9) cast)
    and summed with math.fsum (exactly rounded). Residual exposure
    (r7 review): fsum of per-term rounded DOUBLES is not bit-equal to
    the oracle's exact decimal sums cast once, so sx/sxx/sxy can sit
    1-2 ulps apart and the n*sxx - sx*sx cancellation amplifies that;
    the final round(slope, 6) absorbs it in practice (driver-green
    since r2) and a slope landing exactly on a 6th-decimal boundary is
    the known residual hazard class (docs/determinism.md, the
    double-decimal-cast section).
    """
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)

    out_schema = "user_id long, n long, slope_per_hour double"
    origin_us = 1704067200000000  # 2024-01-01 in epoch µs

    def trend(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        if len(pdf) < 2:
            return pd.DataFrame(columns=["user_id", "n", "slope_per_hour"])
        ts_us = pdf["ts"].astype("int64") // 1000
        x = [round(float(v - origin_us) / 3600000000.0, 9) for v in ts_us]
        y = [round(float(v), 2) for v in pdf["value"]]
        n = len(x)
        sx, sy = math.fsum(x), math.fsum(y)
        sxx = math.fsum(round(a * a, 18) for a in x)
        sxy = math.fsum(round(a * b, 11) for a, b in zip(x, y))
        denom = n * sxx - sx * sx
        # a user whose events all share one quantized hour has zero
        # x-variance: the oracle's double division yields NULL there,
        # so emit NULL instead of raising ZeroDivisionError (r7 review)
        slope = None if denom == 0.0 else round((n * sxy - sx * sy) / denom, 6)
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n],
             "slope_per_hour": [slope]}
        )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(trend, out_schema)


# ---------------------------------------------------------------------------
# S7: SQL-string entry point with optimizer hints
# ---------------------------------------------------------------------------


@query(
    "sql_entry_star_join",
    oracle="""
SELECT n_name, o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, o_orderstatus
""",
    tags=("relational", "S7"),
)
def sql_entry_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point 2 (SURVEY §3): the same engine via spark.sql over
    registered views, with a BROADCAST hint in SQL form."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ["orders", "customer", "nation"])
    return spark.sql(
        """
        SELECT /*+ BROADCAST(customer), BROADCAST(nation) */
               n_name, o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, o_orderstatus
        """
    )


@query(
    "sql_correlated_above_avg",
    oracle="""
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
WHERE CAST(o.o_totalprice AS DECIMAL(12,2))
      * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(12,2)))
         FROM orders i WHERE i.o_custkey = o.o_custkey)
""",
    tags=("relational", "S7", "subquery"),
)
def sql_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above their customer's average, written as TWO
    correlated scalar subqueries through the SQL entry point — the §4
    decorrelation evidence: Catalyst rewrites both into one aggregated
    self-join (RewriteCorrelatedScalarSubquery + MergeScalarSubqueries
    collapse the two subqueries into a single aggregate pass), so the
    executed plan scans orders twice, never once per outer row.

    Determinism: the avg compare is cross-multiplied (price·cnt >
    sum) in DECIMAL, so membership is integer-exact — a float
    `price > sum/cnt` could flip boundary rows between engines.
    """
    from ..catalog import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE CAST(o.o_totalprice AS DECIMAL(12,2))
              * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(12,2)))
                 FROM orders i WHERE i.o_custkey = o.o_custkey)
        """
    )


# ---------------------------------------------------------------------------
# Retention / downsample tier (SURVEY §1.1): batch compaction of raw
# events into a coarser rollup table, written partitioned and re-read
# ---------------------------------------------------------------------------


@query(
    "ts_downsample_tier",
    out_schema="day string, event_type string, n_events bigint, sum_value double, min_value double, max_value double",
    oracle="""
SELECT day, event_type, n_events, sum_value, min_value, max_value
FROM (
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY 1, 2
)
""",
    tags=("tsdb", "retention", "S5"),
)
def ts_downsample_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample tier: compact raw events to a daily rollup table at
    rest (partitioned parquet), then serve from the rollup. This is
    the retention/continuous-aggregate pattern: older data lives only
    at this granularity and queries hit ~1/1000th of the bytes."""

    path = _roundtrip_dir(sf_dir, "rollup_daily", "events")
    ev = load_table(spark, sf_dir, "events")
    (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    tier = spark.read.parquet(path)
    return tier.select(
        F.col("day").cast("string").alias("day"),
        "event_type",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (exhaustive at oracle scale;
# the LSH-accelerated path for big corpora is emb_ann_lsh)
# ---------------------------------------------------------------------------


@query(
    "emb_cosine_near_dups",
    oracle="""
WITH pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(generate_series(1, 64),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           / SQRT(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))
               * list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine > 0.5
""",
    tags=("vectors", "near-dup"),
)
def emb_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine > 0.5 (exhaustive O(n²) — the
    correctness baseline; swap in the LSH bucket join for scale)."""
    from ..functions import vec_cosine, vec_double

    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), vec_double(F.col("embedding")).alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), vec_double(F.col("embedding")).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", vec_cosine(F.col("va"), F.col("vb")).alias("cosine")
    )
    return scored.filter(F.col("cosine") > 0.5)


# ---------------------------------------------------------------------------
# A4+: median / mode aggregates; value histogram (width-bucketed)
# ---------------------------------------------------------------------------


@query(
    "rel_median_mode",
    oracle="""
WITH counts AS (
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2
), mode_pick AS (
    SELECT o_orderstatus, o_orderpriority AS mode_priority
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                     ORDER BY cnt DESC, o_orderpriority) AS r
        FROM counts
    ) WHERE r = 1
)
SELECT m.o_orderstatus,
       round(median(o.o_totalprice), 6) AS median_price,
       any_value(m.mode_priority) AS mode_priority,
       COUNT(o.o_totalprice) AS n
FROM orders o JOIN mode_pick m USING (o_orderstatus)
GROUP BY m.o_orderstatus
HAVING COUNT(o.o_totalprice) > 0
""",
    tags=("relational", "A4"),
)
def rel_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median() + a DETERMINISTIC mode (most frequent, ties broken by
    smallest value — built-in mode() tie-breaking is engine-defined,
    which a hash-compared result can't tolerate)."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mode_pick = top_k_per_group(
        counts,
        group=["o_orderstatus"],
        order=[F.col("cnt").desc(), F.col("o_orderpriority")],
        k=1,
    ).select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    # r9: count-table median replaced the Percentile-buffer hazard
    # (three status groups each buffering a third of orders in one
    # Median hashmap). r10: range-bucketed median replaces the
    # count-table form's 3-task cumulative window — two-pass exact,
    # width-parallel at any group count, bit-interchangeable
    # (operators/quantiles.py, docs/scale.md r10 addendum).
    from ..operators.quantiles import range_bucketed_quantiles

    med = range_bucketed_quantiles(
        o, ["o_orderstatus"], "o_totalprice", [0.5], ["__med"], n_name="n"
    ).select(
        "o_orderstatus",
        F.round("__med", 6).alias("median_price"),
        "n",
    )
    return med.join(mode_pick, "o_orderstatus").select(
        "o_orderstatus", "median_price", "mode_priority", "n"
    )


@query(
    "ts_value_histogram",
    oracle="""
SELECT event_type,
       CAST(floor(value / 25.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, bucket
""",
    tags=("tsdb", "histogram"),
)
def ts_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (floor bucketing —
    the TSDB heat-map primitive)."""

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(25.0)).alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Batch EWMA (the streaming stateful op's batch twin, as a first-class
# query). Oracled exactly (upgraded from rows-only in r5): the Spark
# side evaluates `alpha*x + (1-alpha)*prev` sequentially over the
# per-user (ts, event_id)-sorted sequence, and a DuckDB recursive CTE
# replays the *same* IEEE-double op sequence in the same order — so the
# computed doubles are bit-identical, the same argument as the
# pack-sequences / pagerank oracles. The literals must be CAST AS
# DOUBLE on the DuckDB side (bare 0.2 parses as DECIMAL(2,1) there,
# which would accumulate in decimal and diverge).
#
# Oracle sf ceiling (ADVICE r5): the recursive CTE advances one row per
# user per iteration (iterations = max per-user sequence length, each
# re-joining seq), so it degrades ~quadratically with sequence length.
# Fine at the sf0.01 verify scale (~67 events/user); if the driver ever
# verifies at sf >= 1, batch the recursion by rn ranges instead.
# ---------------------------------------------------------------------------


@query(
    "ts_ema",
    oracle="""
WITH RECURSIVE seq AS (
    SELECT user_id, event_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
ema AS (
    SELECT user_id, event_id, ts, value, rn, value AS ema
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.event_id, s.ts, s.value, s.rn,
           CAST(0.2 AS DOUBLE) * s.value + CAST(0.8 AS DOUBLE) * e.ema AS ema
    FROM ema e JOIN seq s ON s.user_id = e.user_id AND s.rn = e.rn + 1
)
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value, ema
FROM ema
""",
    tags=("tsdb", "ema"),
)
def ts_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average (alpha=0.2) in batch form."""
    from ..streaming.stateful import batch_ema

    return batch_ema(spark, sf_dir, alpha=0.2)


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) smoothing — level + trend per
# series, the forecasting step up from ts_ema (r6). Same sanctioned-
# sequential-boundary contract: numpy scalar loop in applyInPandas,
# DuckDB recursive CTE replaying the identical IEEE op sequence.
# Constants: 1.0-0.3 == 0.7 and 1.0-0.1 == 0.9 exactly (ties-to-even),
# so the oracle's CAST(0.7/0.9 AS DOUBLE) are the same doubles the
# Python closure folds. The trend column recomputes the level
# expression inline (same bits — it IS the same expression) so the CTE
# needs no intra-SELECT alias reference. Oracle sf ceiling: same
# ~quadratic recursive-join profile as ts_ema (note there).
# ---------------------------------------------------------------------------


@query(
    "ts_holt_linear",
    oracle="""
WITH RECURSIVE seq AS (
    SELECT user_id, event_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
hw AS (
    SELECT user_id, event_id, ts, value, rn,
           value AS lvl, CAST(0 AS DOUBLE) AS trd
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.event_id, s.ts, s.value, s.rn,
           CAST(0.3 AS DOUBLE) * s.value
               + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd) AS lvl,
           CAST(0.1 AS DOUBLE)
               * ((CAST(0.3 AS DOUBLE) * s.value
                   + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd)) - h.lvl)
               + CAST(0.9 AS DOUBLE) * h.trd AS trd
    FROM hw h JOIN seq s ON s.user_id = h.user_id AND s.rn = h.rn + 1
)
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value,
       lvl AS level, trd AS trend, lvl + trd AS forecast_next
FROM hw
""",
    tags=("tsdb", "forecast", "W8"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear smoothing (alpha=0.3, beta=0.1): level,
    trend, and the one-step-ahead forecast level+trend, over the
    (ts, event_id) order. Seeds: level = first value, trend = 0.

    Scale: the stateful.batch_ema contract — one shuffle on user_id
    into the sanctioned applyInPandas boundary, numpy scalar loop
    (~0.3 µs/row), cross-series fan-out is the parallelism.
    """
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    ev = load_table(spark, sf_dir, "events")
    a, b1, g, g1 = 0.3, 1.0 - 0.3, 0.1, 1.0 - 0.1

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        xs = pdf["value"].to_numpy(dtype="float64")
        n = len(xs)
        lvl = np.empty(n)
        trd = np.empty(n)
        l = t = 0.0
        for i in range(n):
            x = xs[i]
            if i == 0:
                l, t = x, 0.0
            else:
                nl = a * x + b1 * (l + t)
                t = g * (nl - l) + g1 * t
                l = nl
            lvl[i] = l
            trd[i] = t
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ts_s": pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "value": pdf["value"],
                "level": lvl,
                "trend": trd,
                "forecast_next": lvl + trd,
            }
        )

    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            run,
            "user_id bigint, event_id bigint, ts_s string, value double, "
            "level double, trend double, forecast_next double",
        )
    )


@query(
    "ts_forecast_backtest",
    oracle="""
WITH RECURSIVE seq AS (
    SELECT user_id, event_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
hw AS (
    SELECT user_id, event_id, ts, value, rn,
           value AS lvl, CAST(0 AS DOUBLE) AS trd
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.event_id, s.ts, s.value, s.rn,
           CAST(0.3 AS DOUBLE) * s.value
               + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd) AS lvl,
           CAST(0.1 AS DOUBLE)
               * ((CAST(0.3 AS DOUBLE) * s.value
                   + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd)) - h.lvl)
               + CAST(0.9 AS DOUBLE) * h.trd AS trd
    FROM hw h JOIN seq s ON s.user_id = h.user_id AND s.rn = h.rn + 1
),
err AS (
    SELECT user_id,
           CAST(floor(abs(value - LAG(lvl + trd) OVER
                (PARTITION BY user_id ORDER BY rn)) * 1000000) AS BIGINT) AS ae_fp
    FROM hw
)
SELECT user_id,
       CAST(COUNT(ae_fp) AS BIGINT) AS n_forecasts,
       CAST(SUM(ae_fp) AS BIGINT) AS sum_abs_err_fp,
       CAST(SUM(ae_fp) AS DOUBLE) / CAST(COUNT(ae_fp) AS DOUBLE)
           / CAST(1000000 AS DOUBLE) AS mae
FROM err
WHERE ae_fp IS NOT NULL
GROUP BY user_id
""",
    tags=("tsdb", "forecast", "backtest"),
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of the Holt forecaster: each row's
    forecast is the PREVIOUS row's level+trend; per-user count and MAE
    of the absolute errors.

    Determinism: the Holt doubles are bit-identical across engines
    (ts_holt_linear's recursive-CTE argument), so each |error| is an
    identical double — floored into 1e6 fixed point (the pagerank
    rule) before summing, making the per-user aggregate integer-exact
    regardless of addition order; MAE divides once at the end.

    Scale: one shuffle into the sanctioned per-series boundary; the
    errors accumulate INSIDE the same numpy loop that runs the
    recursion (a post-hoc lag over the formatted output would re-order
    same-second events — ts_s truncates sub-second — so the backtest
    never leaves the exactly-ordered loop), and each series emits one
    row.
    """
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    ev = load_table(spark, sf_dir, "events")
    a, b1, g, g1 = 0.3, 1.0 - 0.3, 0.1, 1.0 - 0.1

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values(
            ["ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        xs = pdf["value"].to_numpy(dtype="float64")
        l = t = 0.0
        n_fc = 0
        s_fp = 0
        for i in range(len(xs)):
            x = xs[i]
            if i == 0:
                l, t = x, 0.0
            else:
                s_fp += int(math.floor(abs(x - (l + t)) * 1000000.0))
                n_fc += 1
                nl = a * x + b1 * (l + t)
                t = g * (nl - l) + g1 * t
                l = nl
        if n_fc == 0:
            return pd.DataFrame(
                columns=["user_id", "n_forecasts", "sum_abs_err_fp", "mae"]
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_forecasts": [n_fc],
                "sum_abs_err_fp": [s_fp],
                "mae": [float(s_fp) / float(n_fc) / 1000000.0],
            }
        )

    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            run,
            "user_id bigint, n_forecasts bigint, sum_abs_err_fp bigint, mae double",
        )
    )


@query(
    "io_orc_scan",
    out_schema="c_mktsegment string, total_bal double, n bigint",
    oracle=f"""
SELECT c_mktsegment, {sql_dsum('c_acctbal', 12, 2)} AS total_bal, COUNT(*) AS n
FROM customer GROUP BY c_mktsegment
""",
    tags=("io", "S2"),
)
def io_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC roundtrip (S2: the other mainstream columnar at-rest format,
    built into Spark): parquet→ORC→scan→aggregate. ORC carries its own
    schema, and predicate pushdown/column pruning work as for parquet."""
    path = _roundtrip_dir(sf_dir, "orc", "customer")
    load_table(spark, sf_dir, "customer").write.mode("overwrite").orc(path)
    df = spark.read.orc(path)
    return df.groupBy("c_mktsegment").agg(
        dsum("c_acctbal", 12, 2).alias("total_bal"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "io_schema_evolution",
    out_schema="c_mktsegment string, n_rows bigint, n_with_tier bigint, n_pos bigint",
    oracle="""
WITH unioned AS (
    SELECT c_mktsegment, NULL AS bal_tier
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_mktsegment,
           CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bal_tier
    FROM customer WHERE c_custkey % 2 = 1
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(bal_tier) AS n_with_tier,
       COUNT(CASE WHEN bal_tier = 'pos' THEN 1 END) AS n_pos
FROM unioned GROUP BY c_mktsegment
""",
    tags=("io", "S2", "schema-evolution"),
)
def io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (S2+): two parquet batches land in the
    same dataset directory, the second carrying a NEW column; reading
    with mergeSchema=true unions by name, back-filling nulls for the
    old batch — the append-only evolution path a long-lived 100 TB
    dataset actually follows (widening only; renames/retypes need a
    rewrite). The oracle replays the same union from the base table."""
    path = _roundtrip_dir(sf_dir, "parquet_evolve", "customer")
    c = load_table(spark, sf_dir, "customer")
    c.filter(F.col("c_custkey") % 2 == 0).write.mode("overwrite").parquet(
        path + "/batch=1"
    )
    c.filter(F.col("c_custkey") % 2 == 1).withColumn(
        "bal_tier",
        F.when(F.col("c_acctbal") >= 0, "pos").otherwise("neg"),
    ).write.mode("overwrite").parquet(path + "/batch=2")
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("bal_tier").alias("n_with_tier"),
        F.count(F.when(F.col("bal_tier") == "pos", F.lit(1))).alias("n_pos"),
    )


@query(
    "io_csv_malformed",
    out_schema="src string, n_rows bigint, n_corrupt bigint, clean_value_sum double",
    # The planted file is a compile-time constant, so the PERMISSIVE
    # accounting it must produce is too: 40 clean rows (value sum
    # 0+0.5+...+19.5 = 390.0), 10 type-broken rows dead-lettered into
    # the corrupt column, 5 arity-short rows accepted with trailing
    # nulls (counted as rows, NOT corrupt). The oracle states those
    # constants; any parser-semantics drift or accounting bug diverges.
    oracle="""
SELECT 'clean' AS src, CAST(40 AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_corrupt, CAST(390.0 AS DOUBLE) AS clean_value_sum
UNION ALL
SELECT 'badtype', CAST(10 AS BIGINT), CAST(10 AS BIGINT), NULL
UNION ALL
SELECT 'badarity', CAST(5 AS BIGINT), CAST(0 AS BIGINT), NULL
""",
    tags=("io", "S2", "data-quality"),
)
def io_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row ingestion (S2 data-quality path, r6): a planted
    CSV mixing clean rows with type-broken and arity-short lines is
    read in PERMISSIVE mode with a corrupt-record column — the
    dead-letter pattern (the streaming twin is kafka.py's from_json
    accounting). PERMISSIVE semantics, pinned in the test: type-broken
    rows land in the corrupt column (whole raw line preserved),
    arity-SHORT rows are accepted with nulls for the missing trailing
    columns (visible via the null accounting, NOT the corrupt column).
    Ingestion never throws (FAILFAST) and never silently drops
    (DROPMALFORMED); every anomaly is countable.

    Oracled (r9, was rows-only; VERDICT r8 item 5 structural-constants
    pattern): the planted file is deterministic, so the expected
    PERMISSIVE accounting is a constant table the oracle can state
    outright — no DuckDB CSV parsing involved (DuckDB's
    ignore_errors/reject semantics differ from Spark PERMISSIVE, which
    is why the oracle asserts the CONTRACT, not a parallel parse).
    """
    path = _roundtrip_dir(sf_dir, "csv_malformed", "events")
    os.makedirs(path, exist_ok=True)
    lines = ["src,event_id,value"]
    for i in range(40):
        lines.append(f"clean,{i},{float(i) / 2}")
    for i in range(40, 50):
        lines.append(f"badtype,{i},not_a_double")
    for i in range(50, 55):
        lines.append(f"badarity,{i}")
    with open(os.path.join(path, "batch.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    df = (
        spark.read.schema(
            "src string, event_id long, value double, _corrupt string"
        )
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return df.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_corrupt").cast("bigint").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("value"))).alias(
            "clean_value_sum"
        ),
    )


@query("io_binary_scan", oracle=None, tags=("io", "S2", "X9", "no-oracle"))
def io_binary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-file ingestion (the X9 multimodal on-ramp, S2 family):
    every fixture parquet read as an opaque blob via the binaryFile
    source; emits (basename, byte length, raw-content md5). Rows-only
    for the driver (oracle SQL runs on pre-registered table views, and
    a path-bearing read_blob() can't parameterize across scale dirs);
    pytest pins sizes and md5s against os.stat + hashlib ground truth
    (DuckDB itself can only md5 a blob through an escaping VARCHAR
    cast, which hashes different bytes than Spark's raw md5(binary)).

    Scale: binaryFile streams whole files as single-row Arrow batches;
    at 100 TB the per-file bytes stay on executors (decode/feature
    UDFs run where the row lives — operators/multimodal.py), and only
    extracted metadata ever shuffles.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir.rstrip("/"))
    )
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("fname"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query("mm_byte_features", oracle=None, tags=("io", "X9", "multimodal", "no-oracle"))
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 byte-level features over real binary blobs (r6): every fixture
    parquet file ingested via binaryFile, format-sniffed JVM-side from
    its magic bytes (operators/multimodal.sniff_format — no Python, no
    decode), then Arrow-batched per-blob byte statistics (Shannon
    entropy, distinct-byte count, modal byte) via mapInPandas.

    Rows-only for the driver (same reason as io_binary_scan: the blob
    domain is the filesystem, not the pre-registered table views);
    tests/test_multimodal.py pins every value against an independent
    pure-Python/numpy recomputation of the same files, and a planted
    fixture (fake png/jpeg/gzip/empty blobs) proves the sniff table and
    the entropy/tie-break conventions.

    Scale: identical contract to io_binary_scan — bytes stay where the
    scan put them, mapInPandas emits fixed-width feature rows, and only
    those ever shuffle. Entropy/histogram is the codec-free stand-in
    for the real decode (module doc: swap in PIL/ffmpeg unchanged).
    """
    from ..operators.multimodal import byte_features, sniff_format

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir.rstrip("/"))
    )
    named = df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("fname"),
        sniff_format(F.col("content")).alias("format"),
        F.col("content"),
    )
    return byte_features(named)


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (alpha=0.3, beta=0.1,
# gamma=0.2, m=24 hourly season) per event-type series — the seasonal
# step up from ts_holt_linear (r6 late). The recursive-CTE oracle
# carries the 24-slot seasonal ring buffer as a DOUBLE[] column,
# updating one slot per row with list_transform; every float op is
# mirrored bit-for-bit (all six smoothing constants are exact doubles;
# l_new is recomputed inline wherever later expressions need it, the
# ts_holt_linear trick). Seeds: level = first y, trend = 0, seasonals
# = 0 (the first cycle behaves like Holt linear while gamma fills the
# ring). Oracle sf ceiling: recursion depth = per-type bucket count
# (~720 at every SF — hourly calendar, not row count).
# ---------------------------------------------------------------------------


@query(
    "ts_holt_winters",
    oracle=f"""
WITH RECURSIVE seq AS (
    SELECT event_type, bucket, y,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
    FROM (
        SELECT event_type, {sql_time_bucket('ts', 3600)} AS bucket,
               CAST(SUM(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2
    )
),
hw AS (
    SELECT event_type, bucket, y, rn,
           y AS lvl, CAST(0 AS DOUBLE) AS trd,
           list_transform(range(1, 25), i -> CAST(0 AS DOUBLE)) AS slist
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.event_type, s.bucket, s.y, s.rn,
           CAST(0.3 AS DOUBLE) * (s.y - h.slist[((s.rn - 1) % 24) + 1])
               + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd) AS lvl,
           CAST(0.1 AS DOUBLE)
               * ((CAST(0.3 AS DOUBLE) * (s.y - h.slist[((s.rn - 1) % 24) + 1])
                   + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd)) - h.lvl)
               + CAST(0.9 AS DOUBLE) * h.trd AS trd,
           list_transform(range(1, 25), i ->
               CASE WHEN i = ((s.rn - 1) % 24) + 1
                    THEN CAST(0.2 AS DOUBLE)
                         * (s.y - (CAST(0.3 AS DOUBLE)
                                   * (s.y - h.slist[((s.rn - 1) % 24) + 1])
                                   + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd)))
                         + CAST(0.8 AS DOUBLE) * h.slist[((s.rn - 1) % 24) + 1]
                    ELSE h.slist[i] END) AS slist
    FROM hw h JOIN seq s ON s.event_type = h.event_type AND s.rn = h.rn + 1
)
SELECT event_type, {sql_ts_str('bucket')} AS bucket_ts, y,
       lvl AS level, trd AS trend,
       slist[((rn - 1) % 24) + 1] AS seasonal,
       lvl + trd + slist[(rn % 24) + 1] AS forecast_next
FROM hw
""",
    tags=("tsdb", "forecast", "W8", "seasonal"),
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive (level + trend + 24-hour seasonality) over
    each event-type's hourly cents series; emits level/trend/seasonal
    and the one-step-ahead forecast level+trend+s_{t+1-m}.

    Same sanctioned-sequential-boundary contract as ts_holt_linear:
    one shuffle on event_type into applyInPandas, numpy scalar loop
    with a 24-slot ring buffer; series length is calendar-bounded so
    the sequential cost is fixed while the series COUNT scales out.
    """
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(100.0)).cast("bigint")
    hourly = (
        ev.select("event_type", time_bucket("ts", 3600).alias("bucket"), cents.alias("c"))
        .groupBy("event_type", "bucket")
        .agg(F.sum("c").cast("double").alias("y"))
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["bucket"], kind="mergesort").reset_index(drop=True)
        ys = pdf["y"].to_numpy(dtype="float64")
        n = len(ys)
        lvl = np.empty(n)
        trd = np.empty(n)
        sea = np.empty(n)
        fc = np.empty(n)
        ring = np.zeros(24)
        l = b = 0.0
        for i in range(n):
            y = ys[i]
            ph = i % 24
            if i == 0:
                l, b = y, 0.0
                sea[i] = ring[ph]  # 0.0, ring untouched (oracle base row)
            else:
                s_old = ring[ph]
                nl = 0.3 * (y - s_old) + 0.7 * (l + b)
                b = 0.1 * (nl - l) + 0.9 * b
                s_new = 0.2 * (y - nl) + 0.8 * s_old
                l = nl
                ring[ph] = s_new
                sea[i] = s_new
            lvl[i] = l
            trd[i] = b
            fc[i] = l + b + ring[(i + 1) % 24]
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "bucket_ts": pdf["bucket"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "y": ys,
                "level": lvl,
                "trend": trd,
                "seasonal": sea,
                "forecast_next": fc,
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        run,
        "event_type string, bucket_ts string, y double, level double, "
        "trend double, seasonal double, forecast_next double",
    )


# ---------------------------------------------------------------------------
# Conformal forecast intervals: q90 of |one-step error| per series,
# selected as an ORDER STATISTIC (no interpolation -> no percentile
# ulp class at all; r6 late)
# ---------------------------------------------------------------------------


@query(
    "ts_forecast_intervals",
    oracle="""
WITH RECURSIVE seq AS (
    SELECT user_id, event_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
hw AS (
    SELECT user_id, event_id, ts, value, rn,
           value AS lvl, CAST(0 AS DOUBLE) AS trd
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.event_id, s.ts, s.value, s.rn,
           CAST(0.3 AS DOUBLE) * s.value
               + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd) AS lvl,
           CAST(0.1 AS DOUBLE)
               * ((CAST(0.3 AS DOUBLE) * s.value
                   + CAST(0.7 AS DOUBLE) * (h.lvl + h.trd)) - h.lvl)
               + CAST(0.9 AS DOUBLE) * h.trd AS trd
    FROM hw h JOIN seq s ON s.user_id = h.user_id AND s.rn = h.rn + 1
),
err AS (
    SELECT user_id,
           CAST(floor(abs(value - LAG(lvl + trd) OVER
                (PARTITION BY user_id ORDER BY rn)) * 1000000) AS BIGINT) AS ae_fp
    FROM hw
),
ranked AS (
    SELECT user_id, ae_fp,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ae_fp) AS rk,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM err WHERE ae_fp IS NOT NULL
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_forecasts,
       CAST(ae_fp AS DOUBLE) / 1000000.0 AS q90_abs_err,
       CAST(ae_fp AS DOUBLE) * 2.0 / 1000000.0 AS interval_width
FROM ranked
WHERE rk = (9 * n + 9) // 10
""",
    tags=("tsdb", "forecast", "conformal"),
)
def ts_forecast_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformal-style prediction intervals for the Holt one-step
    forecaster: the 90th-percentile absolute error per series, taken
    as the ceil(0.9 n)-th ORDER STATISTIC of the integer fixed-point
    errors — pure integer selection, so the whole percentile-ulp
    hazard class (interpolation, round-half) is structurally absent
    (index = (9n+9) div 10, integer ceiling). Interval = +-q90 around
    the forecast, the standard split-conformal width.

    Holt recursion + error fixed-point are ts_forecast_backtest's
    exactly-proven machinery; this query adds only integer ranking on
    top (one user-keyed sort window).
    """
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    ev = load_table(spark, sf_dir, "events")
    a, b1, g, g1 = 0.3, 1.0 - 0.3, 0.1, 1.0 - 0.1

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        xs = pdf["value"].to_numpy(dtype="float64")
        n = len(xs)
        errs = []
        l = t = 0.0
        for i in range(n):
            x = xs[i]
            if i == 0:
                l, t = x, 0.0
            else:
                errs.append(int(math.floor(abs(x - (l + t)) * 1000000)))
                nl = a * x + b1 * (l + t)
                t = g * (nl - l) + g1 * t
                l = nl
        if not errs:
            return pd.DataFrame(
                columns=["user_id", "n_forecasts", "q90_abs_err", "interval_width"]
            )
        errs.sort()
        m = len(errs)
        q = errs[(9 * m + 9) // 10 - 1]
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_forecasts": [m],
                "q90_abs_err": [q / 1000000.0],
                "interval_width": [q * 2.0 / 1000000.0],
            }
        )

    return ev.select("user_id", "event_id", "ts", "value").groupBy("user_id").applyInPandas(
        run,
        "user_id bigint, n_forecasts bigint, q90_abs_err double, "
        "interval_width double",
    )


# ---------------------------------------------------------------------------
# DQ1: data-quality expectation suite (dbt-test-style validation report)
# ---------------------------------------------------------------------------


@query(
    "dq_expectations",
    oracle="""
SELECT 'orders.fk_custkey_valid' AS check_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations
UNION ALL
SELECT 'lineitem.fk_orderkey_valid',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'customer.pk_unique',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
       (SELECT CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer)
UNION ALL
SELECT 'events.ts_in_range',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events
        WHERE ts IS NULL OR ts < TIMESTAMP '2000-01-01'
           OR ts >= TIMESTAMP '2030-01-01')
UNION ALL
SELECT 'documents.n_chars_matches_text',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE n_chars IS NULL OR length(text) != n_chars)
UNION ALL
SELECT 'orders.status_accepted',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
""",
    tags=("dq", "DQ1", "validation"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite validation report — the dbt-tests / Great
    Expectations shape: one row per check with checked/violation
    counts. Referential integrity (two FK checks as anti-join counts),
    primary-key uniqueness, timestamp range, derived-column
    consistency (n_chars == length(text)), accepted-value domain.

    Each check is one aggregate over its table (FK checks are
    broadcast/shuffle anti-joins — never row-by-row lookups); the
    report is a 6-row union. At 100 TB each check is an independent
    scan-and-agg a scheduler can run concurrently; nothing here
    collects or loops.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")

    def report(name: str, n_checked: DataFrame, n_viol: DataFrame) -> DataFrame:
        a = n_checked.select(F.count(F.lit(1)).cast("bigint").alias("n_checked"))
        b = n_viol.select(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        return a.join(b).select(
            F.lit(name).alias("check_name"), "n_checked", "n_violations"
        )

    checks = [
        report(
            "orders.fk_custkey_valid",
            o,
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        ),
        report(
            "lineitem.fk_orderkey_valid",
            li,
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        # pk_unique: violations = rows - distinct keys (count-based, not
        # a count-of-anti-join, so build it directly
        c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct("c_custkey"))
            .cast("bigint")
            .alias("n_violations"),
        ).select(F.lit("customer.pk_unique").alias("check_name"), "n_checked", "n_violations"),
        report(
            "events.ts_in_range",
            ev,
            ev.filter(
                F.col("ts").isNull()
                | (F.col("ts") < F.lit("2000-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2030-01-01").cast("timestamp"))
            ),
        ),
        report(
            "documents.n_chars_matches_text",
            d,
            d.filter(
                F.col("n_chars").isNull() | (F.length("text") != F.col("n_chars"))
            ),
        ),
        report(
            "orders.status_accepted",
            o,
            o.filter(~F.col("o_orderstatus").isin("O", "F", "P")),
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionAll(chk)
    return out


# ---------------------------------------------------------------------------
# DQ2: shuffle-key skew diagnostics (histogram math, no global sort)
# ---------------------------------------------------------------------------


_SKEW_SQL_ONE = """
SELECT '{label}' AS key_name, n_keys, n_rows, max_size, p50_size, p99_size,
       round(CAST(max_size AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS top1_share,
       round(CAST(2 * s1 - (n_keys + 1) * n_rows AS DOUBLE)
             / CAST(n_keys * n_rows AS DOUBLE), 6) AS gini
FROM (
    WITH sizes AS (
        SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS sz FROM {table} GROUP BY {key}
    ),
    hist AS (
        SELECT sz, CAST(COUNT(*) AS BIGINT) AS k_s FROM sizes GROUP BY sz
    ),
    cum AS (
        SELECT h.sz, h.k_s,
               (SELECT COALESCE(SUM(h2.k_s), 0) FROM hist h2 WHERE h2.sz <= h.sz)
                   AS cum_k
        FROM hist h
    ),
    tot AS (
        SELECT CAST(SUM(k_s) AS BIGINT) AS n_keys,
               CAST(SUM(sz * k_s) AS BIGINT) AS n_rows,
               CAST(MAX(sz) AS BIGINT) AS max_size,
               CAST(SUM(sz * (k_s * (cum_k - k_s)
                              + (k_s * (k_s + 1)) / 2)) AS BIGINT) AS s1
        FROM cum
    )
    SELECT n_keys, n_rows, max_size, s1,
           (SELECT MIN(sz) FROM cum, tot
            WHERE cum_k * 2 >= n_keys) AS p50_size,
           (SELECT MIN(sz) FROM cum, tot
            WHERE cum_k * 100 >= 99 * n_keys) AS p99_size
    FROM tot
)
"""


@query(
    "diag_key_skew",
    oracle=(
        _SKEW_SQL_ONE.format(label="events.user_id", key="user_id", table="events")
        + " UNION ALL "
        + _SKEW_SQL_ONE.format(
            label="lineitem.l_partkey", key="l_partkey", table="lineitem"
        )
    ),
    tags=("dq", "DQ2", "skew"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report for two join/agg keys (events.user_id,
    lineitem.l_partkey): key count, row count, largest key, exact
    median and p99 group size, the top-1 key's row share, and the Gini
    coefficient of the size distribution — the planning statistic that
    decides salting / AQE skew-join before a 100 TB shuffle.

    Exact order statistics WITHOUT any global sort: group sizes
    collapse to a SIZE HISTOGRAM (bounded by max group size, tiny),
    cumulative counts come from a broadcast theta self-join over the
    histogram, and p50/p99 read off the cumulative table. The Gini
    rank-sum uses the same histogram: keys of size s occupy ranks
    (K_before, K_before + k_s], so sum(rank*size) = sum_s s*(k_s*K_before
    + k_s(k_s+1)/2) — all integer arithmetic, one final division.
    """
    D = lambda c: c.cast("double")

    def one(df: DataFrame, key: str, label: str) -> DataFrame:
        sizes = df.groupBy(key).agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
        hist = sizes.groupBy("sz").agg(F.count(F.lit(1)).cast("bigint").alias("k_s"))
        cum = (
            hist.join(
                F.broadcast(
                    hist.select(F.col("sz").alias("o_sz"), F.col("k_s").alias("o_k"))
                ),
                F.col("o_sz") <= F.col("sz"),
            )
            .groupBy("sz", "k_s")
            .agg(F.sum("o_k").cast("bigint").alias("cum_k"))
        )
        tot = cum.agg(
            F.sum("k_s").cast("bigint").alias("n_keys"),
            F.sum(F.col("sz") * F.col("k_s")).cast("bigint").alias("n_rows"),
            F.max("sz").cast("bigint").alias("max_size"),
            F.sum(
                F.col("sz")
                * (
                    F.col("k_s") * (F.col("cum_k") - F.col("k_s"))
                    + F.expr("(k_s * (k_s + 1)) div 2")
                )
            )
            .cast("bigint")
            .alias("s1"),
        )
        p50 = (
            cum.join(F.broadcast(tot.select("n_keys")))
            .filter(F.col("cum_k") * 2 >= F.col("n_keys"))
            .agg(F.min("sz").cast("bigint").alias("p50_size"))
        )
        p99 = (
            cum.join(F.broadcast(tot.select("n_keys")))
            .filter(F.col("cum_k") * 100 >= F.col("n_keys") * 99)
            .agg(F.min("sz").cast("bigint").alias("p99_size"))
        )
        return (
            tot.join(F.broadcast(p50))
            .join(F.broadcast(p99))
            .select(
                F.lit(label).alias("key_name"),
                "n_keys",
                "n_rows",
                "max_size",
                "p50_size",
                "p99_size",
                F.round(D(F.col("max_size")) / D(F.col("n_rows")), 6).alias(
                    "top1_share"
                ),
                F.round(
                    D(F.lit(2) * F.col("s1") - (F.col("n_keys") + 1) * F.col("n_rows"))
                    / D(F.col("n_keys") * F.col("n_rows")),
                    6,
                ).alias("gini"),
            )
        )

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    return one(ev, "user_id", "events.user_id").unionAll(
        one(li, "l_partkey", "lineitem.l_partkey")
    )


# ---------------------------------------------------------------------------
# S5b: small-file compaction (storage maintenance; rows-only)
# ---------------------------------------------------------------------------


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 8 * 1024 * 1024,
) -> tuple[int, int, int]:
    """Compact a parquet directory to ~target-sized files: size the
    output file count from the INPUT's on-disk bytes (sum of part
    files), then rewrite with one round-robin repartition. Returns
    (files_before, files_after, n_out) — n_out is the computed target
    file count, returned so callers verify sizing against THIS
    function's math instead of re-deriving it (ADVICE r10).

    The OPTIMIZE/compaction maintenance op every long-lived table
    needs: streaming sinks and fine-grained partitions accrete small
    files, and at 100 TB scan cost is dominated by per-file overhead
    (footer reads, scheduling) once files drop below ~a few MB. The
    rewrite is one shuffle-free-scan + repartition write; at scale it
    runs per-partition-directory so only small-file partitions pay.
    """
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))  # ceil div
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    after = [
        f for r, _, fs in os.walk(dst) for f in fs if f.endswith(".parquet")
    ]
    return len(files), len(after), n_out


@query(
    "io_compaction",
    out_schema="files_before int, compacted int, sized_to_target int, rows bigint, sum_event_id bigint, sum_cents bigint",
    oracle="""
SELECT CAST(50 AS INTEGER) AS files_before,
       CAST(1 AS INTEGER) AS compacted,
       CAST(1 AS INTEGER) AS sized_to_target,
       CAST(COUNT(*) AS BIGINT) AS rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM events
""",
    tags=("io", "S5b", "maintenance"),
)
def io_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5b: fragment events into 50 small files, compact to ~8 MB
    targets, and report the accounting: file counts plus content
    checksums (row count, event_id sum, exact cents sum) proving the
    rewrite is lossless.

    Oracled (r9, was rows-only; the gov_forget_user structural-
    constants pattern per VERDICT r8 item 5): the checksums are plain
    SQL over the source table (losslessness), and the filesystem facts
    are emitted as structural INVARIANTS rather than raw counts —
    files_before is 50 by construction, `compacted` is files_after <
    files_before, `sized_to_target` is files_after == the target file
    count compact_parquet itself computed (returned as n_out — ADVICE
    r10 removed the oracle's independent re-derivation of the sizing
    math and its second 8 MiB constant), capped at `rows` because a
    round-robin repartition writes no file for an empty partition, so
    inputs smaller than n_out rows legitimately emit fewer files. A
    failed or no-op compaction (after == before), a size-targeting
    bug, or any lost/duplicated row diverges from the oracle
    constants; the invariant form stays fixture-size-portable where a
    raw files_after count would pin one SF's byte size. File-count
    reduction and checksum identity also pinned in
    tests/test_r6c_ops.py.
    """
    frag = _roundtrip_dir(sf_dir, "frag", "events")
    comp = _roundtrip_dir(sf_dir, "compact", "events")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(50).write.mode("overwrite").parquet(frag)
    files_before, files_after, n_out = compact_parquet(spark, frag, comp)
    back = spark.read.parquet(comp)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("rows"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    ).select(
        F.lit(files_before).cast("int").alias("files_before"),
        F.lit(int(files_after < files_before)).cast("int").alias("compacted"),
        (
            F.lit(files_after).cast("bigint")
            == F.least(F.lit(n_out).cast("bigint"), F.col("rows"))
        )
        .cast("int")
        .alias("sized_to_target"),
        "rows",
        "sum_event_id",
        "sum_cents",
    )


# ---------------------------------------------------------------------------
# S2c: nested-JSON roundtrip (complex-type IO)
# ---------------------------------------------------------------------------


@query(
    "io_nested_json",
    out_schema="o_custkey bigint, n_orders bigint, cents_total bigint, n_open bigint",
    oracle=f"""
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents_total,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_open
FROM orders GROUP BY o_custkey
""",
    tags=("io", "S2c", "json"),
)
def io_nested_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON IO roundtrip: orders are re-shaped into nested
    records ({key, customer, detail: {price, status}, tags: [...]}),
    written as JSON lines, read back WITH an explicit nested schema,
    flattened, and re-aggregated — proving struct fields, array
    columns, and numeric fidelity survive the text format. The oracle
    aggregates the ORIGINAL table, so the hash compare is the
    losslessness proof (the io_csv_scan contract, nested edition).

    Cents survive exactly: the price crosses JSON as a number and the
    comparison rounds to integer cents on both sides. Schema-on-read
    (no inference) is the 100 TB discipline — inference is a full
    extra scan.
    """
    path = _roundtrip_dir(sf_dir, "njson", "orders")
    o = load_table(spark, sf_dir, "orders")
    nested = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_custkey").alias("customer"),
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        ).alias("detail"),
        F.array(F.col("o_orderpriority"), F.lit("order")).alias("tags"),
    )
    nested.write.mode("overwrite").json(path)
    schema = (
        "key bigint, customer bigint, "
        "detail struct<price: double, status: string>, tags array<string>"
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy(F.col("customer").alias("o_custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(
            F.round(F.col("detail.price") * 100, 0).cast("bigint")
        )
        .cast("bigint")
        .alias("cents_total"),
        F.sum((F.col("detail.status") == "O").cast("int"))
        .cast("bigint")
        .alias("n_open"),
    )


# ---------------------------------------------------------------------------
# S7c: recursive CTE through the SQL entry (graph reachability)
# ---------------------------------------------------------------------------

_REACH_SQL = """
WITH RECURSIVE baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
reach (seed, part, hop) AS (
    SELECT l_partkey AS seed, l_partkey AS part, 0 AS hop
    FROM (SELECT DISTINCT l_partkey FROM lineitem
          WHERE l_partkey <= 5)
    UNION ALL
    SELECT r.seed, e.dst, r.hop + 1
    FROM reach r JOIN edges e ON r.part = e.src
    WHERE r.hop < 2
)
SELECT seed,
       CAST(COUNT(DISTINCT CASE WHEN hop <= 1 THEN part END) - 1 AS BIGINT)
           AS n_within_1,
       CAST(COUNT(DISTINCT part) - 1 AS BIGINT) AS n_within_2
FROM reach
GROUP BY seed
"""


@query(
    "sql_recursive_reach",
    oracle=_REACH_SQL,
    tags=("sql-entry", "S7c", "graph", "recursive"),
)
def sql_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7c: WITH RECURSIVE through the SQL entry (Spark 4 recursive
    CTE support — probed, works): 2-hop reachability over the part
    co-order graph from seed parts (partkey <= 5), counting distinct
    parts within 1 and within 2 hops (seed excluded). The IDENTICAL
    SQL text runs on both engines — the strongest S7 parity statement
    in the registry: not just the same semantics, the same query
    string exercising the same recursion feature.

    The recursion is depth-BOUNDED (hop < 2 guard), so the iteration
    count is constant regardless of data size; the working set per
    iteration is seeds x frontier, never the whole graph.
    """
    from ..catalog import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_REACH_SQL)


# ---------------------------------------------------------------------------
# Gov2: right-to-erasure on the keyed store (delete + vacuum)
# ---------------------------------------------------------------------------


@query(
    "gov_forget_user",
    out_schema="rows_before bigint, rows_after bigint, rows_removed bigint, n_forgotten_users bigint, n_vacuumed_gens bigint, n_gens_retained bigint, leak_rows bigint",
    oracle="""
WITH s AS (
    SELECT user_id,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
    FROM events
    GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS rows_before,
       CAST(COUNT(*) FILTER (WHERE user_id % 17 <> 0) AS BIGINT) AS rows_after,
       CAST(COUNT(*) FILTER (WHERE user_id % 17 = 0) AS BIGINT) AS rows_removed,
       CAST(COUNT(DISTINCT user_id) FILTER (WHERE user_id % 17 = 0) AS BIGINT)
           AS n_forgotten_users,
       CAST(1 AS BIGINT) AS n_vacuumed_gens,
       CAST(1 AS BIGINT) AS n_gens_retained,
       CAST(0 AS BIGINT) AS leak_rows
FROM s
""",
    tags=("governance", "Gov2"),
)
def gov_forget_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gov2: the right-to-erasure workflow on the keyed upsert store —
    build per-(user, day) state from events, DELETE every row for the
    erasure set (user_id % 17 == 0) as a committed generation, then
    VACUUM older generations (time-travel retention is exactly what a
    deletion request must also erase — the snapshot that still holds
    the data). Returns the audit row a compliance run would log:
    counts before/after, and leak_rows = rows for erased users across
    ALL retained generations, which must be 0.

    Oracled (r8): the audit counts are pure SQL over events — rows
    before/after = distinct (user, day) groups with/without the
    erasure set — and the workflow's bookkeeping values are structural
    constants of a SUCCESSFUL run (one upsert commit -> gen0, the
    delete commit -> gen1, vacuum keep_last=1 removes exactly gen0,
    leaving 1 retained generation and 0 leaked rows). A run that fails
    to delete, vacuum, or fully erase diverges from the oracle — which
    is precisely what the driver hash should witness. The zero-leak
    and exact-removal invariants are additionally pinned in
    tests/test_r6c_ops.py.
    """
    import shutil

    root = tempfile.mkdtemp(prefix="chrono_gov_forget_")
    try:
        return _gov_forget_user(spark, sf_dir, root)
    finally:
        # the audit row is built from collected scalars, so the store
        # can be removed eagerly — without this every invocation leaked
        # a full copy of the aggregated state on the driver's disk
        # (ADVICE r6)
        shutil.rmtree(root, ignore_errors=True)


def _gov_forget_user(spark: SparkSession, sf_dir: str, root: str) -> DataFrame:
    from ..streaming.upsert import (
        delete_keys,
        list_generations,
        read_state,
        upsert_batch,
        vacuum_generations,
    )

    ev = load_table(spark, sf_dir, "events")
    state0 = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
        "event_id",
    ).groupBy("user_id", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("event_id").cast("bigint").alias("seq"),
    )
    upsert_batch(state0, root, keys=["user_id", "d"], seq_col="seq")
    before = read_state(spark, root)
    rows_before = before.count()
    # materialize the erasure set: its lazy plan is rooted in the gen-0
    # snapshot, which the vacuum below physically removes (an erasure
    # request list is small by nature — this collect is the workflow's
    # actual input, not a data-sized pull)
    forget_ids = [
        r.user_id
        for r in before.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 17 == 0)
        .collect()
    ]
    n_forgotten = len(forget_ids)
    forget = spark.createDataFrame(
        [(u,) for u in forget_ids], "user_id long"
    )
    delete_keys(spark, root, "user_id", forget)
    vacuumed = vacuum_generations(root, keep_last=1)
    leak = 0
    for g in list_generations(root):
        snap = read_state(spark, root, gen=g)
        leak += snap.join(forget, "user_id", "left_semi").count()
    after = read_state(spark, root)
    rows_after = after.count()
    return spark.createDataFrame(
        [
            (
                rows_before,
                rows_after,
                rows_before - rows_after,
                n_forgotten,
                vacuumed,
                len(list_generations(root)),
                leak,
            )
        ],
        "rows_before long, rows_after long, rows_removed long, "
        "n_forgotten_users long, n_vacuumed_gens long, n_gens_retained long, "
        "leak_rows long",
    )


# ---------------------------------------------------------------------------
# Diag3: parquet footer introspection (storage metadata, no data scan)
# ---------------------------------------------------------------------------


@query("io_footer_stats", oracle=None, tags=("io", "Diag3", "no-oracle"))
def io_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diag3: per-file parquet FOOTER statistics for the events table —
    row counts, row-group counts, byte sizes, and the ts column's
    min/max from column-chunk statistics, read via pyarrow WITHOUT
    scanning data pages. This is the metadata a scan planner prunes
    with (ts_zorder_values pins the pruning effect; this query exposes
    the stats themselves as a relation — the "SELECT * FROM
    parquet_metadata(...)" surface).

    Driver-side work is bounded by file COUNT (footers only; at scale
    this runs as a distributed mapPartitions over file paths). The
    row-count and min/max agreement with a real scan is pinned in
    tests/test_r6c_ops.py.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    files = sorted(_glob.glob(os.path.join(src, "*.parquet"))) or [src]
    rows = []
    for fp in files:
        pf = pq.ParquetFile(fp)
        md = pf.metadata
        ts_idx = next(
            i for i in range(md.schema.to_arrow_schema().names.__len__())
            if md.schema.to_arrow_schema().names[i] == "ts"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ts_idx).statistics
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
        fmt = lambda v: str(v)[:19].replace("T", " ")
        rows.append(
            (
                os.path.basename(fp),
                int(md.num_rows),
                int(md.num_row_groups),
                int(os.path.getsize(fp)),
                fmt(min(mins)) if mins else None,
                fmt(max(maxs)) if maxs else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "file_name string, n_rows long, n_row_groups long, size_bytes long, "
        "ts_min_s string, ts_max_s string",
    )


@query(
    "io_footer_totals",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS ts_min_s,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS ts_max_s,
       MIN(value) AS value_min,
       MAX(value) AS value_max
FROM events
""",
    tags=("io", "Diag3"),
)
def io_footer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diag3, oracled: the footer-vs-scan agreement claim itself. The
    engine side answers COUNT/min/max for the events table from parquet
    FOOTER statistics alone (no data pages); the oracle answers the
    same question with a full DuckDB scan — a green row proves the
    metadata a pruning planner trusts is exactly the data's truth
    (io_footer_stats stays the per-file/rows-only detail view; this is
    its driver-hash-comparable aggregate: min over row-group mins IS
    the scan min because both stats are exact for timestamps and
    doubles, and second-truncation commutes with min/max).

    Driver-side work is bounded by file COUNT (footers only; at scale
    the footer walk distributes as mapPartitions over file paths,
    exactly like io_footer_stats).
    """
    import glob as _glob

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    files = sorted(_glob.glob(os.path.join(src, "*.parquet"))) or [src]
    n_rows = 0
    ts_mins, ts_maxs, v_mins, v_maxs = [], [], [], []
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = md.schema.to_arrow_schema().names
        ts_idx, v_idx = names.index("ts"), names.index("value")
        n_rows += int(md.num_rows)
        for rg in range(md.num_row_groups):
            ts_st = md.row_group(rg).column(ts_idx).statistics
            v_st = md.row_group(rg).column(v_idx).statistics
            if ts_st is not None and ts_st.has_min_max:
                ts_mins.append(ts_st.min)
                ts_maxs.append(ts_st.max)
            if v_st is not None and v_st.has_min_max:
                v_mins.append(v_st.min)
                v_maxs.append(v_st.max)
    fmt = lambda v: str(v)[:19].replace("T", " ")
    row = (
        n_rows,
        fmt(min(ts_mins)) if ts_mins else None,
        fmt(max(ts_maxs)) if ts_maxs else None,
        float(min(v_mins)) if v_mins else None,
        float(max(v_maxs)) if v_maxs else None,
    )
    return spark.createDataFrame(
        [row],
        "n_rows long, ts_min_s string, ts_max_s string, "
        "value_min double, value_max double",
    )


# ---------------------------------------------------------------------------
# S2d: CSV dialect roundtrip (delimiter/quote/escape/null options)
# ---------------------------------------------------------------------------


@query(
    "io_csv_dialect",
    out_schema="p_brand string, n bigint, cents_total bigint, n_null_type bigint, name_chars bigint",
    oracle="""
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents_total,
       CAST(SUM(CASE WHEN p_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_type,
       CAST(SUM(length(p_name)) AS BIGINT) AS name_chars
FROM (
    SELECT p_brand,
           CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_type END AS p_type,
           p_retailprice,
           p_name || '|quoted,"tricky"' AS p_name
    FROM part
) GROUP BY p_brand
""",
    tags=("io", "S2d", "csv"),
)
def io_csv_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV DIALECT roundtrip: values containing the delimiter, double
    quotes, and embedded quote characters, plus explicit NULLs, are
    written with a non-default dialect (| delimiter, " quote, \\
    escape, \\N null marker) and read back with the same options — the
    option surface (sep/quote/escape/nullValue) that separates "reads
    a CSV" from "survives real CSV". The oracle computes from the
    SOURCE table with the same injected values, so the hash compare
    proves the dialect roundtrip is lossless — including that \\N came
    back as NULL, not the string.
    """
    path = _roundtrip_dir(sf_dir, "csvdialect", "part")
    p = load_table(spark, sf_dir, "part")
    tricky = p.select(
        "p_brand",
        F.when(F.col("p_size") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("p_type"))
        .alias("p_type"),
        "p_retailprice",
        F.concat(F.col("p_name"), F.lit('|quoted,"tricky"')).alias("p_name"),
    )
    opts = {
        "sep": "|",
        "quote": '"',
        "escape": "\\",
        "nullValue": "\\N",
        "header": "true",
    }
    tricky.write.mode("overwrite").options(**opts).csv(path)
    back = (
        spark.read.options(**opts)
        .schema("p_brand string, p_type string, p_retailprice double, p_name string")
        .csv(path)
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents_total"),
        F.sum(F.col("p_type").isNull().cast("int")).cast("bigint").alias(
            "n_null_type"
        ),
        F.sum(F.length("p_name")).cast("bigint").alias("name_chars"),
    )


# ---------------------------------------------------------------------------
# DQ3: per-column profiling report (cardinality / nulls / top value)
# ---------------------------------------------------------------------------


@query(
    "dq_column_profile",
    oracle="""
WITH top_status AS (
    SELECT o_orderstatus AS v, COUNT(*) AS c FROM orders
    GROUP BY v ORDER BY c DESC, v ASC LIMIT 1
),
top_prio AS (
    SELECT o_orderpriority AS v, COUNT(*) AS c FROM orders
    GROUP BY v ORDER BY c DESC, v ASC LIMIT 1
)
SELECT 'o_orderstatus' AS column_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
       (SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders)
           AS n_distinct,
       (SELECT CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) FROM orders)
           AS n_null,
       (SELECT v FROM top_status) AS top_value,
       (SELECT CAST(c AS BIGINT) FROM top_status) AS top_freq
UNION ALL
SELECT 'o_orderpriority',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT) FROM orders),
       (SELECT v FROM top_prio),
       (SELECT CAST(c AS BIGINT) FROM top_prio)
UNION ALL
SELECT 'o_custkey',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) FROM orders),
       NULL,
       NULL
""",
    tags=("dq", "DQ3", "profiling"),
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling report for the orders table — row count,
    distinct cardinality, null count, and (for low-cardinality
    columns) the modal value with its frequency, ties broken
    lexicographically so "top value" is deterministic. The
    source-onboarding profile every warehouse runs before modeling a
    new feed; one row per profiled column.

    Each column's stats are independent scan-aggs (concurrently
    schedulable); the mode uses the deterministic (count desc, value
    asc) cut, never an arbitrary first().
    """
    o = load_table(spark, sf_dir, "orders")

    def mode_of(col: str):
        return (
            o.groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("v").asc())
            .limit(1)
        )

    def profile(col: str, with_mode: bool) -> DataFrame:
        base = o.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            (F.count(F.lit(1)) - F.count(col)).cast("bigint").alias("n_null"),
        )
        if with_mode:
            m = mode_of(col).select(
                F.col("v").alias("top_value"), F.col("c").cast("bigint").alias("top_freq")
            )
            # LEFT join, not cross: on an empty table mode_of() is
            # empty and a cross join would vanish the whole profile
            # row, where the oracle's scalar subqueries keep it with
            # NULL top_value/top_freq (ADVICE r6)
            base = base.join(F.broadcast(m), F.lit(True), "left")
        else:
            base = base.select(
                "*",
                F.lit(None).cast("string").alias("top_value"),
                F.lit(None).cast("bigint").alias("top_freq"),
            )
        return base.select(
            F.lit(col).alias("column_name"),
            "n_rows",
            "n_distinct",
            "n_null",
            "top_value",
            "top_freq",
        )

    return (
        profile("o_orderstatus", True)
        .unionAll(profile("o_orderpriority", True))
        .unionAll(profile("o_custkey", False))
    )


# ---------------------------------------------------------------------------
# S5c: dynamic partition overwrite (surgical backfill semantics)
# ---------------------------------------------------------------------------


@query(
    "io_dynamic_overwrite",
    out_schema="day string, n_events bigint, cents_sum bigint",
    # The final table state is fully declarative: every day keeps its
    # original rows except the earliest day, whose values are doubled
    # (the corrected backfill). The cents chain mirrors the engine op
    # order exactly — the doubled VALUE is what lands on disk, so the
    # checksum is round((value*2)*100), not round(value*100)*2.
    oracle="""
WITH base AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, value FROM events
), m AS (
    SELECT MIN(day) AS d0 FROM base
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(
           (CASE WHEN day = (SELECT d0 FROM m) THEN value * 2
                 ELSE value END) * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents_sum
FROM base GROUP BY day
""",
    tags=("io", "S5c"),
)
def io_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5c: dynamic partition overwrite — the surgical-backfill
    semantic: a corrected batch for ONE day replaces only that day's
    partition (partitionOverwriteMode=dynamic), while static mode
    would have wiped the whole table. The query writes events
    partitioned by day, overwrites the earliest day with a corrected
    copy (values doubled), and reports per-partition row counts and
    the cents checksum so the output shows exactly one partition
    changed and all others byte-identical.

    Oracled (r9, was rows-only; VERDICT r8 item 5): the expected final
    state is plain SQL over the source — original per-day groups with
    the earliest day's values doubled. A static-mode wipe (other
    partitions lost), a failed overwrite (first day not corrected), or
    duplicated partition data all diverge from the oracle. The same
    invariants remain pinned in tests.
    """
    path = _roundtrip_dir(sf_dir, "dynover", "events")
    ev = load_table(spark, sf_dir, "events")
    base = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    base.write.mode("overwrite").partitionBy("day").parquet(path)
    first_day = base.agg(F.min("day").alias("d")).collect()[0].d
    corrected = base.filter(F.col("day") == first_day).withColumn(
        "value", F.col("value") * 2
    )
    (
        corrected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents_sum"),
    )


# ---------------------------------------------------------------------------
# X4b: UDTF with TABLE argument (partitioned polymorphic table function)
# ---------------------------------------------------------------------------


@query(
    "udtf_user_profile",
    oracle="""
WITH g AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_gaps
FROM g GROUP BY user_id
""",
    tags=("udf", "X4b", "udtf"),
)
def udtf_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4b: Python UDTF consuming a TABLE ARGUMENT with PARTITION BY /
    ORDER BY (Spark 4 polymorphic table functions — probed, works):
    `SELECT * FROM profile(TABLE(events) PARTITION BY user_id ORDER BY
    ts, event_id)`. The engine hands each user's rows to one UDTF
    instance IN ORDER, so the function sees exactly the per-series
    stream a stateful operator would — the SQL-surface twin of
    applyInPandas, and the API udtf_bigrams' lateral form can't reach.

    The profile itself (count, max inter-arrival gap) is deliberately
    SQL-expressible so the oracle can verify the mechanism end to end.
    """
    from pyspark.sql.functions import udtf

    from ..catalog import register_views

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint, n_gaps bigint")
    class Profile:
        def __init__(self):
            self._n = 0
            self._prev = None
            self._maxg = None
            self._uid = None

        def eval(self, row):
            self._uid = row["user_id"]
            self._n += 1
            us = row["us"]
            if self._prev is not None:
                g = us - self._prev
                if self._maxg is None or g > self._maxg:
                    self._maxg = g
            self._prev = us

        def terminate(self):
            if self._n:
                yield self._uid, self._n, self._maxg, self._n - 1

    register_views(spark, sf_dir, ["events"])
    spark.udtf.register("chrono_user_profile", Profile)
    return spark.sql(
        """
        SELECT * FROM chrono_user_profile(
            TABLE(SELECT user_id, unix_micros(ts) AS us, event_id FROM events)
            PARTITION BY user_id ORDER BY (us, event_id)
        )
        """
    )


# ---------------------------------------------------------------------------
# S5d: sort-within-partitions write (row-group stats tightness)
# ---------------------------------------------------------------------------


@query("io_sorted_write", oracle=None, tags=("io", "S5d", "layout", "no-oracle"))
def io_sorted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5d: time-clustered write — repartitionByRange(ts) +
    sortWithinPartitions(ts), the 1-D special case of Z-ordering and
    the cheap layout optimization every time-series table should get:
    each file (and row group) covers a DISJOINT time slice, so a
    time-range scan prunes whole files from footer stats alone. The
    query writes events both ways (4 files each), reads the ts
    statistics back from the parquet FOOTERS (io_footer_stats
    machinery) and reports each layout's mean row-group ts span — the
    pruning benefit as a measured number, not a claim. Rows-only
    (file layout); clustered-span << round-robin-span is pinned in
    tests.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    # ts goes to the file as epoch-us BIGINT: Spark's DEFAULT parquet
    # timestamp encoding is INT96 (no column statistics — observed live
    # as stats == None); RUNTIME_CONFS now forces TIMESTAMP_MICROS
    # engine-wide, and the integer column keeps this experiment
    # independent of that conf
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )

    def span_stats(path: str) -> tuple[int, float]:
        spans, n_groups = [], 0
        for fp in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
            pf = pq.ParquetFile(fp)
            md = pf.metadata
            names = md.schema.to_arrow_schema().names
            ts_idx = names.index("ts_us")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ts_idx).statistics
                if st is not None and st.has_min_max:
                    n_groups += 1
                    spans.append((st.max - st.min) / 1e6)
        return n_groups, (sum(spans) / len(spans) if spans else 0.0)

    out_rows = []
    for mode in ("unsorted", "sorted"):
        path = _roundtrip_dir(sf_dir, f"sortw_{mode}", "events")
        if mode == "sorted":
            df = ev.repartitionByRange(4, "ts_us").sortWithinPartitions("ts_us")
        else:
            df = ev.repartition(4)
        df.write.mode("overwrite").option(
            "parquet.block.size", 256 * 1024
        ).parquet(path)
        n_groups, mean_span = span_stats(path)
        out_rows.append((mode, n_groups, round(mean_span, 1)))
    return spark.createDataFrame(
        out_rows, "layout string, n_row_groups long, mean_ts_span_s double"
    )


# ---------------------------------------------------------------------------
# Gov3: snapshot diff between store generations (time-travel delta)
# ---------------------------------------------------------------------------


@query(
    "gov_snapshot_diff",
    out_schema="added bigint, deleted bigint, updated bigint, unchanged bigint",
    # The two snapshots are declarative functions of the source: gen0
    # aggregates events with event_id <= floor(max/2), gen1 the full
    # set, so the diff accounting replays as two grouped CTEs and one
    # full outer join. `deleted` is structurally 0 (gen1's batch is a
    # superset); a merge bug (lost keys, stale counts, broken time
    # travel to gen=0) diverges from the oracle.
    oracle="""
WITH s AS (
    SELECT user_id,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           event_id
    FROM events
), m AS (
    SELECT CAST(FLOOR(MAX(event_id) / 2) AS BIGINT) AS mid FROM events
), g0 AS (
    SELECT user_id, d, COUNT(*) AS n0 FROM s
    WHERE event_id <= (SELECT mid FROM m) GROUP BY user_id, d
), g1 AS (
    SELECT user_id, d, COUNT(*) AS n1 FROM s GROUP BY user_id, d
)
SELECT CAST(SUM(CASE WHEN g0.n0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS added,
       CAST(SUM(CASE WHEN g1.n1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS deleted,
       CAST(SUM(CASE WHEN g0.n0 IS NOT NULL AND g1.n1 IS NOT NULL
                          AND g0.n0 != g1.n1 THEN 1 ELSE 0 END) AS BIGINT)
           AS updated,
       CAST(SUM(CASE WHEN g0.n0 IS NOT NULL AND g1.n1 IS NOT NULL
                          AND g0.n0 = g1.n1 THEN 1 ELSE 0 END) AS BIGINT)
           AS unchanged
FROM g0 FULL OUTER JOIN g1
  ON g0.user_id = g1.user_id AND g0.d = g1.d
""",
    tags=("governance", "Gov3"),
)
def gov_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gov3: the DIFF between two retained generations of the keyed
    store — added / updated / unchanged / (would-be) deleted key
    counts, the table-format DESCRIBE-HISTORY companion that makes
    time travel (read_state(gen=...)) auditable: "what did that merge
    actually do". Built by applying the first half of events as batch
    1 and the full set as batch 2, then full-outer-joining the two
    snapshots on the key.

    Oracled (r9, was rows-only; VERDICT r8 item 5): the batch split is
    now the deterministic floor(max(event_id)/2) — the previous
    percentile_approx(0.5) split was sketch-dependent and thus not
    SQL-replayable, the one engine change this conversion needed
    (the same reason the PELT conversion swapped np.var for exact
    moments). The driver hash now witnesses upsert MERGE generations
    and gen=0 time travel end to end. Planted add/update/unchanged
    accounting remains pinned in tests.
    """
    from ..streaming.upsert import read_state, state_scratch_root, upsert_batch

    # Per-invocation numbered store with keep-last-2 retention: a
    # previous call's returned DataFrame stays lazily readable while
    # disk stays bounded, and the fresh subdir guarantees gen=0/1
    # below are THIS run's generations (the r7 fixed-root
    # clear-up-front invalidated live prior results — ADVICE r7).
    root = state_scratch_root("snapdiff")
    ev = load_table(spark, sf_dir, "events")
    # deterministic split (NOT percentile_approx: sketch-dependent,
    # hence un-oracle-able — see the conversion note in the docstring)
    mid = ev.agg(
        F.floor(F.max("event_id") / 2).cast("bigint").alias("m")
    ).collect()[0].m
    state = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("d"),
        "event_id",
    )

    def agg_of(df):
        return df.groupBy("user_id", "d").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("event_id").cast("bigint").alias("seq"),
        )

    upsert_batch(agg_of(state.filter(F.col("event_id") <= mid)), root,
                 keys=["user_id", "d"], seq_col="seq")
    upsert_batch(agg_of(state), root, keys=["user_id", "d"], seq_col="seq")
    g0 = read_state(spark, root, gen=0).select(
        "user_id", "d", F.col("n_events").alias("n0")
    )
    g1 = read_state(spark, root, gen=1).select(
        "user_id", "d", F.col("n_events").alias("n1")
    )
    j = g0.join(g1, ["user_id", "d"], "full_outer")
    return j.agg(
        F.sum((F.col("n0").isNull()).cast("int")).cast("bigint").alias("added"),
        F.sum((F.col("n1").isNull()).cast("int")).cast("bigint").alias("deleted"),
        F.sum(
            (F.col("n0").isNotNull() & F.col("n1").isNotNull()
             & (F.col("n0") != F.col("n1"))).cast("int")
        ).cast("bigint").alias("updated"),
        F.sum(
            (F.col("n0").isNotNull() & F.col("n1").isNotNull()
             & (F.col("n0") == F.col("n1"))).cast("int")
        ).cast("bigint").alias("unchanged"),
    )

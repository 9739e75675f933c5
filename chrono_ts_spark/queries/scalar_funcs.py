"""Scalar function surface (SURVEY.md §2.8) — one oracle-checked query
per family: string, date/time, math, conditional/null, array, JSON,
hash. All built-in Catalyst expressions (whole-stage codegen; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import vec_double
from . import query

# ---------------------------------------------------------------------------
# Strings
# ---------------------------------------------------------------------------


@query(
    "sf_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_u,
       lower(p_brand) AS brand_l,
       CAST(length(p_name) AS INTEGER) AS name_len,
       substring(p_name, 1, 5) AS name_5,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_us,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       lpad(p_brand, 12, '*') AS brand_pad,
       CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos,
       trim(concat('  ', p_name, '  ')) AS trimmed,
       split_part(p_name, ' ', 2) AS second_token,
       translate(p_brand, '#', '-') AS brand_dash,
       reverse(p_brand) AS brand_rev,
       repeat(p_brand, 2) AS brand_2x,
       left(p_name, 3) AS name_l3,
       right(p_name, 3) AS name_r3
FROM part
""",
    tags=("scalar", "string"),
)
def sf_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, regexp, pad…"""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.instr("p_name", "a").alias("a_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_token"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_2x"),
        F.left(F.col("p_name"), F.lit(3)).alias("name_l3"),
        F.right(F.col("p_name"), F.lit(3)).alias("name_r3"),
    )


# ---------------------------------------------------------------------------
# Date / time
# ---------------------------------------------------------------------------


@query(
    "sf_datetime_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_date
FROM orders
""",
    tags=("scalar", "datetime"),
)
def sf_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. DOW convention differs (Spark: 1=Sunday;
    DuckDB: 0=Sunday) — oracle adds 1 to align."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").alias(
            "epoch_s"
        ),
        F.date_format(d, "yyyy-MM-dd").alias("iso_date"),
    )


# ---------------------------------------------------------------------------
# Math
# ---------------------------------------------------------------------------


@query(
    "sf_math_funcs",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000) AS abs_diff,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       sqrt(p_retailprice) AS price_sqrt,
       round(ln(p_retailprice), 10) AS price_ln,
       round(exp(CAST(p_size AS DOUBLE) / 10), 10) AS size_exp,
       round(pow(CAST(p_size AS DOUBLE), 2.5), 8) AS size_pow,
       CAST(p_size % 7 AS INTEGER) AS size_mod7,
       greatest(p_retailprice, 1500.0) AS g,
       least(p_retailprice, 1500.0) AS l,
       CAST(sign(p_retailprice - 1500) AS DOUBLE) AS price_sign,
       CAST(p_size AS DOUBLE) / 3 AS size_third,
       round(log10(p_retailprice), 10) AS price_log10,
       round(log2(CAST(p_size AS DOUBLE)), 10) AS size_log2
FROM part
""",
    tags=("scalar", "math"),
)
def sf_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Transcendentals (ln/exp/pow/log) are rounded to
    8–10 decimals on both sides — JVM StrictMath and C libm may differ
    in the last ulp; IEEE-exact ops (sqrt/abs/floor/ceil) are raw."""
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.abs(price - 1000).alias("abs_diff"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.log(price), 10).alias("price_ln"),
        F.round(F.exp(size_d / 10), 10).alias("size_exp"),
        F.round(F.pow(size_d, 2.5), 8).alias("size_pow"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.greatest(price, F.lit(1500.0)).alias("g"),
        F.least(price, F.lit(1500.0)).alias("l"),
        F.signum(price - 1500).alias("price_sign"),
        (size_d / 3).alias("size_third"),
        F.round(F.log10(price), 10).alias("price_log10"),
        F.round(F.log2(size_d), 10).alias("size_log2"),
    )


# ---------------------------------------------------------------------------
# Conditional / null handling
# ---------------------------------------------------------------------------


@query(
    "sf_conditional_funcs",
    oracle="""
SELECT c_custkey,
       coalesce(o_totalprice, 0.0) AS price_or_zero,
       CASE WHEN o_orderkey IS NULL THEN 'none' ELSE o_orderstatus END AS status,
       nullif(c_mktsegment, 'BUILDING') AS seg_nb,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       CAST(o_orderkey IS NOT NULL AS INTEGER) AS has_order
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
""",
    tags=("scalar", "conditional"),
)
def sf_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / CASE / boolean-to-int over an outer join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
        F.when(F.col("o_orderkey").isNull(), "none")
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.col("o_orderkey").isNotNull().cast("int").alias("has_order"),
    )


# ---------------------------------------------------------------------------
# Arrays (higher-order functions included)
# ---------------------------------------------------------------------------


@query(
    "sf_array_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))) AS DOUBLE) AS head_sum,
       CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS vmax,
       CAST(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS vmin,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
       array_to_string(list_transform(list_sort(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))), x -> CAST(floor(x * 100000) AS BIGINT)), ',') AS head_sorted
FROM embeddings
""",
    tags=("scalar", "array"),
)
def sf_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, index, slice, higher-order transform/filter/
    aggregate, sort. Elements cast to double before arithmetic so both
    engines accumulate identically.

    head_sorted crosses the oracle boundary as a comma-joined string of
    floor(x*1e5) longs: the driver canonicalizer can't hash raw arrays
    (round-1 ERR), and floor-scaled integers sidestep both double
    stringification and round-half-mode differences between engines
    (the float multiply is the same IEEE op on both sides).
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = vec_double(F.col("embedding"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.aggregate(
            F.slice(emb_d, 1, 8), F.lit(0.0), lambda acc, x: acc + x
        ).alias("head_sum"),
        F.array_max(emb_d).alias("vmax"),
        F.array_min(emb_d).alias("vmin"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        F.array_join(
            F.transform(
                F.sort_array(F.slice(emb_d, 1, 3)),
                lambda x: F.floor(x * 100000).cast("long"),
            ),
            ",",
        ).alias("head_sorted"),
    )


# ---------------------------------------------------------------------------
# JSON (events.props)
# ---------------------------------------------------------------------------


@query(
    "sf_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.missing') AS missing_val,
       CAST(json_valid(props) AS INTEGER) AS is_valid
FROM events
""",
    tags=("scalar", "json"),
)
def sf_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over the props column (get_json_object / from_json)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        F.from_json("props", "k INT").isNotNull().cast("int").alias("is_valid"),
    )


# ---------------------------------------------------------------------------
# Hash / checksum
# ---------------------------------------------------------------------------


@query(
    "sf_hash_funcs",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       CAST(length(md5(c_name)) AS INTEGER) AS md5_len
FROM customer
""",
    tags=("scalar", "hash"),
)
def sf_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable content hashes (md5 / sha256 hex)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.length(F.md5("c_name")).alias("md5_len"),
    )


@query(
    "sf_agg_predicates",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS BIGINT) AS n_big,
       CAST(bool_and(o_totalprice > 0) AS INTEGER) AS all_positive,
       CAST(bool_or(o_orderpriority = '1-URGENT') AS INTEGER) AS any_urgent,
       CAST(MIN(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey END) AS BIGINT)
           AS first_urgent_key
FROM orders
GROUP BY o_orderstatus
""",
    tags=("scalar", "agg-predicates"),
)
def sf_agg_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregates (r6, §2.8 completion): count_if, every/any
    (bool_and/bool_or), and a deterministic any-value stand-in (MIN over
    the predicate's key — Spark's any_value/first are pick-whatever,
    which a hash-compared result can't tolerate; docs/determinism.md
    result-SET rule)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).cast("bigint").alias("n_big"),
        F.every(F.col("o_totalprice") > 0).cast("int").alias("all_positive"),
        F.some(urgent).cast("int").alias("any_urgent"),
        F.min(F.when(urgent, F.col("o_orderkey"))).cast("bigint").alias("first_urgent_key"),
    )


# ---------------------------------------------------------------------------
# URLs — regex-portable parsing (Spark's parse_url/url_decode are
# JVM-native but have no DuckDB twin, so the oracled surface uses
# identical regexes; parse_url is the documented production swap-in)
# ---------------------------------------------------------------------------


@query(
    "sf_url_funcs",
    oracle="""
WITH u AS (
    SELECT doc_id,
           'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || '&page=' || CAST(doc_id % 10 AS VARCHAR) AS url
    FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
       regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
       regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       regexp_extract(url, '[?&]page=([^&]*)', 1) AS page_param,
       split_part(regexp_extract(url, '^[a-z]+://([^/]+)/', 1), '.', 1)
           AS subdomain,
       split_part(regexp_extract(url, '^[a-z]+://([^/]+)/', 1), '.', 3)
           AS tld,
       reverse(split_part(regexp_extract(url, '^[a-z]+://([^/]+)/', 1), '.', 1))
           || '.' ||
       regexp_extract(url, '^[a-z]+://[a-z0-9]+\\.(.*?)/', 1) AS host_rev_key
FROM u
""",
    tags=("scalar", "url"),
)
def sf_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: scheme/host/path/query-param extraction plus the
    reversed-host clustering key (the web-corpus partitioning trick —
    co-locates a site's pages under range partitioning).

    Deterministic URL built from document columns; parsing via regexes
    whose semantics are identical in Java regex and RE2 (character
    classes, anchors, lazy dot — no lookaround). Both engines return
    '' for a non-matching extract (verified). All map-side, codegen'd,
    shuffle-free.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&page="),
        (F.col("doc_id") % 10).cast("string"),
    )
    host = F.regexp_extract(F.col("url"), "^[a-z]+://([^/]+)/", 1)
    return (
        d.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            F.regexp_extract("url", "^([a-z]+)://", 1).alias("scheme"),
            host.alias("host"),
            F.regexp_extract("url", "://[^/]+(/[^?]*)", 1).alias("path"),
            F.regexp_extract("url", "[?&]lang=([^&]*)", 1).alias("lang_param"),
            F.regexp_extract("url", "[?&]page=([^&]*)", 1).alias("page_param"),
            F.split_part(host, F.lit("."), F.lit(1)).alias("subdomain"),
            F.split_part(host, F.lit("."), F.lit(3)).alias("tld"),
            F.concat(
                F.reverse(F.split_part(host, F.lit("."), F.lit(1))),
                F.lit("."),
                F.regexp_extract("url", "^[a-z]+://[a-z0-9]+\\.(.*?)/", 1),
            ).alias("host_rev_key"),
        )
    )


# ---------------------------------------------------------------------------
# Bitwise — scalar ops + grouped bit-aggregates (all integer-exact)
# ---------------------------------------------------------------------------


@query(
    "sf_bitwise_funcs",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS k_and,
       o_orderkey | 16 AS k_or,
       xor(o_orderkey, 85) AS k_xor,
       (o_orderkey % 16) << 3 AS k_shl,
       o_orderkey >> 2 AS k_shr,
       CAST(bit_count(o_orderkey) AS INTEGER) AS k_popcount,
       ~o_orderkey AS k_not,
       CAST(o_orderkey & (o_orderkey - 1) = 0 AND o_orderkey > 0 AS INTEGER)
           AS is_pow2
FROM orders
""",
    tags=("scalar", "bitwise"),
)
def sf_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount/not plus the
    power-of-two trick — integer-exact end to end (note the SQL
    dialect trap: `^` is XOR in Spark SQL but POWER in DuckDB, so the
    oracle spells `xor()`)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(16)).alias("k_or"),
        k.bitwiseXOR(F.lit(85)).alias("k_xor"),
        F.shiftleft(k % 16, 3).cast("bigint").alias("k_shl"),
        F.shiftright(k, 2).cast("bigint").alias("k_shr"),
        F.bit_count(k).alias("k_popcount"),
        F.bitwise_not(k).alias("k_not"),
        ((k.bitwiseAND(k - 1) == 0) & (k > 0)).cast("int").alias("is_pow2"),
    )


# ---------------------------------------------------------------------------
# Governance: deterministic column masking / pseudonymization
# ---------------------------------------------------------------------------


@query(
    "sf_masking_funcs",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_token,
       CASE WHEN length(c_name) >= 4
            THEN repeat('*', CAST(length(c_name) - 4 AS INTEGER))
                 || right(c_name, 4)
            ELSE c_name END AS name_masked,
       left(c_name, 1) || repeat('*', CAST(length(c_name) - 1 AS INTEGER))
           AS name_redacted,
       CAST(round(c_acctbal / 1000.0) * 1000 AS BIGINT) AS acctbal_bucket,
       md5(CAST(c_custkey AS VARCHAR) || '|' || c_mktsegment) AS segment_token,
       c_mktsegment
FROM customer
""",
    tags=("scalar", "governance", "masking"),
)
def sf_masking_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance masking surface: md5 pseudonymization (stable
    join-able token), last-4 partial masking, first-char redaction,
    coarse value bucketing, and a salted composite token — each a
    deterministic pure projection, so masked tables stay joinable on
    the tokens and aggregable on the buckets while the raw identifier
    never leaves the scan stage. Map-side only, codegen-friendly.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_token"),
        F.when(
            F.length("c_name") >= 4,
            F.concat(
                F.repeat(F.lit("*"), F.length("c_name") - 4),
                F.substring(F.col("c_name"), -4, 4),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("name_masked"),
        F.concat(
            F.left(F.col("c_name"), F.lit(1)),
            F.repeat(F.lit("*"), F.length("c_name") - 1),
        ).alias("name_redacted"),
        (F.round(F.col("c_acctbal") / F.lit(1000.0)) * 1000)
        .cast("bigint")
        .alias("acctbal_bucket"),
        F.md5(
            F.concat(F.col("c_custkey").cast("string"), F.lit("|"), F.col("c_mktsegment"))
        ).alias("segment_token"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# Struct (nested record navigation)
# ---------------------------------------------------------------------------


@query(
    "sf_struct_funcs",
    oracle="""
SELECT o_orderkey,
       ({'inn': {'cust': o_custkey, 'price': o_totalprice},
         'st': o_orderstatus}).inn.cust AS cust_via_struct,
       ({'inn': {'cust': o_custkey, 'price': o_totalprice},
         'st': o_orderstatus}).st AS st_via_struct,
       CASE WHEN ({'inn': {'cust': o_custkey, 'price': o_totalprice},
                   'st': o_orderstatus}).inn.price > 100000.0
            THEN 'big' ELSE 'small' END AS price_bucket,
       CAST({'c': o_custkey} = {'c': o_custkey} AS INTEGER) AS self_eq
FROM orders
""",
    tags=("scalar", "struct"),
)
def sf_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: create, nest, field-path navigation, struct
    equality, struct fields in CASE — the nested-record surface that
    completes the scalar grid (array/map/json already covered). Every
    output reduces to a scalar so the oracle boundary never serializes
    a struct (engines disagree on struct-to-text formatting).
    """
    o = load_table(spark, sf_dir, "orders")
    nested = F.struct(
        F.struct(
            F.col("o_custkey").alias("cust"), F.col("o_totalprice").alias("price")
        ).alias("inn"),
        F.col("o_orderstatus").alias("st"),
    )
    return o.select(
        "o_orderkey",
        nested.getField("inn").getField("cust").alias("cust_via_struct"),
        nested.getField("st").alias("st_via_struct"),
        F.when(nested.getField("inn").getField("price") > 100000.0, "big")
        .otherwise("small")
        .alias("price_bucket"),
        (
            F.struct(F.col("o_custkey").alias("c"))
            == F.struct(F.col("o_custkey").alias("c"))
        )
        .cast("int")
        .alias("self_eq"),
    )


# ---------------------------------------------------------------------------
# Encoding (base64 / hex / codepoint)
# ---------------------------------------------------------------------------


@query(
    "sf_encoding_funcs",
    oracle="""
SELECT p_partkey,
       base64(encode(p_name)) AS name_b64,
       hex(p_name) AS name_hex,
       ascii(p_name) AS first_codepoint,
       chr(65 + p_size % 26) AS size_letter,
       CAST(length(decode(from_base64(base64(encode(p_name)))))
            AS BIGINT) AS roundtrip_len,
       CAST(length(decode(from_base64(base64(encode(p_name)))))
            = length(p_name) AS INTEGER) AS roundtrip_ok
FROM part
""",
    tags=("scalar", "encoding"),
)
def sf_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding family: base64 encode + decode roundtrip, hex of the
    UTF-8 bytes (uppercase on both engines — probed), codepoint <->
    char. Rounds out the scalar grid's binary-text boundary (the hash
    family covers digest hex; this covers reversible encodings).
    """
    p = load_table(spark, sf_dir, "part")
    b64 = F.base64(F.col("p_name").cast("binary"))
    rt_len = F.length(F.unbase64(b64).cast("string")).cast("bigint")
    return p.select(
        "p_partkey",
        b64.alias("name_b64"),
        F.hex(F.col("p_name")).alias("name_hex"),
        F.ascii("p_name").alias("first_codepoint"),
        F.expr("char(65 + p_size % 26)").alias("size_letter"),
        rt_len.alias("roundtrip_len"),
        (rt_len == F.length("p_name")).cast("int").alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# Error-safe casts / arithmetic (TRY semantics)
# ---------------------------------------------------------------------------


@query(
    "sf_try_funcs",
    oracle="""
SELECT p_partkey,
       TRY_CAST(p_name AS BIGINT) AS name_as_int,
       TRY_CAST(CAST(p_size AS VARCHAR) AS BIGINT) AS size_roundtrip,
       TRY_CAST(substr(p_type, 1, 3) AS DOUBLE) AS type_prefix_num,
       CASE WHEN (p_size - 5) = 0 THEN NULL
            ELSE CAST(round(p_retailprice / (p_size - 5), 6) AS DOUBLE) END
           AS price_per_adjusted,
       CAST(TRY_CAST(p_name AS BIGINT) IS NULL AS INTEGER) AS name_not_numeric
FROM part
""",
    tags=("scalar", "try-semantics"),
)
def sf_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe TRY semantics: try_cast turns malformed casts into
    NULLs instead of job-killing exceptions, and try_divide absorbs
    division by zero — the safe-ingestion family (io_csv_malformed is
    its file-level sibling; this is the expression level). A 100 TB
    job that throws on row 40 billion wastes the cluster; TRY
    semantics convert poison rows into auditable NULLs.

    DuckDB has no try_divide, so the oracle's divide-by-zero guard is
    the equivalent CASE; Spark's try_divide must agree with it —
    cross-proving the NULL-on-zero semantic rather than assuming it.
    """
    p = load_table(spark, sf_dir, "part")
    # Column.try_cast / F.expr: the DataFrame API exposes try_cast on
    # Column (not pyspark.sql.functions); try_divide is a function
    return p.select(
        "p_partkey",
        F.col("p_name").try_cast("bigint").alias("name_as_int"),
        F.col("p_size").cast("string").try_cast("bigint").alias("size_roundtrip"),
        F.substring("p_type", 1, 3).try_cast("double").alias("type_prefix_num"),
        F.round(
            F.try_divide(F.col("p_retailprice"), F.col("p_size") - 5), 6
        ).alias("price_per_adjusted"),
        F.col("p_name").try_cast("bigint").isNull().cast("int").alias(
            "name_not_numeric"
        ),
    )


# ---------------------------------------------------------------------------
# Interval / calendar arithmetic
# ---------------------------------------------------------------------------


@query(
    "sf_interval_funcs",
    oracle="""
SELECT o_orderkey,
       -- to_months/+int forms, NOT two `+ INTERVAL` siblings: DuckDB
       -- 1.0.0's subexpression elimination collapses structurally
       -- similar date+INTERVAL expressions onto the FIRST interval
       -- (probed: both came back +1 month) — docs/determinism.md
       strftime(CAST(o_orderdate AS DATE) + to_months(1), '%Y-%m-%d')
           AS plus_month,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')
           AS plus_30d,
       strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
           AS quarter_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
           AS month_end,
       CAST(last_day(CAST(o_orderdate AS DATE))
            - date_trunc('month', CAST(o_orderdate AS DATE)) + 1 AS BIGINT)
           AS days_in_month
FROM orders
""",
    tags=("scalar", "interval"),
)
def sf_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic family: +1 month (END-OF-MONTH
    CLAMPING probed identical — Jan 31 + 1 month = Feb 29 on both
    engines), +30 days, quarter truncation, last_day, and days-in-
    month — the add_months/clamping surface docs/determinism.md's
    months_between exclusion does NOT cover (the divergence there is
    day-FRACTION conventions; whole-date arithmetic agrees). Dates
    cross the boundary as formatted strings.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd")
    return o.select(
        "o_orderkey",
        fmt(F.add_months(d, 1)).alias("plus_month"),
        fmt(F.date_add(d, 30)).alias("plus_30d"),
        fmt(F.date_trunc("quarter", d)).alias("quarter_start"),
        fmt(F.last_day(d)).alias("month_end"),
        (F.datediff(F.last_day(d), F.trunc(d, "month")) + 1)
        .cast("bigint")
        .alias("days_in_month"),
    )

"""Scalar-function surface: string, regexp, date/time, math,
conditional/null handling.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, never Python UDFs — so they cost the same as
native SQL at any scale and vectorize inside the parquet scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "scalar_string_funcs",
    tags=("scalar", "string"),
    oracle="""
SELECT
  c_custkey,
  UPPER(c_name) AS name_upper,
  LOWER(c_mktsegment) AS seg_lower,
  LENGTH(c_name) AS name_len,
  SUBSTR(c_name, 1, 8) AS name_prefix,
  CONCAT(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
  TRIM('  ' || c_mktsegment || ' ') AS seg_trim,
  LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
  STRPOS(c_name, '0') AS pos_zero,
  CAST(CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS BIGINT) AS has_one,
  REPLACE(c_name, 'Customer', 'Cust') AS name_replaced,
  REVERSE(c_mktsegment) AS seg_rev
FROM customer
WHERE c_custkey <= 400
ORDER BY c_custkey
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string scalar surface: concat/substr/trim/pad/case/length, JVM codegen."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat("c_mktsegment", F.lit("#"), F.col("c_custkey").cast("string")).alias("seg_key"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.instr("c_name", "0").cast("bigint").alias("pos_zero"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).cast("bigint").alias("has_one"),
        F.replace("c_name", F.lit("Customer"), F.lit("Cust")).alias("name_replaced"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    ).orderBy("c_custkey")


@register(
    "scalar_regexp_funcs",
    tags=("scalar", "string"),
    oracle="""
SELECT
  p_partkey,
  regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
  LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS n_tokens,
  CAST(CASE WHEN regexp_matches(p_type, '^[a-z]+ ') THEN 1 ELSE 0 END AS BIGINT) AS starts_word
FROM part
WHERE p_partkey <= 500
ORDER BY p_partkey
""",
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/replace/count over text — the first-match regex tier."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        (F.length("p_name") - F.length(F.replace("p_name", F.lit(" "), F.lit(""))) + 1)
        .cast("bigint")
        .alias("n_tokens"),
        F.when(F.col("p_type").rlike("^[a-z]+ "), 1).otherwise(0).cast("bigint").alias("starts_word"),
    ).orderBy("p_partkey")


@register(
    "scalar_regexp_extract_all",
    tags=("scalar", "string"),
    oracle="""
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '[a-z]*tion'), ','), '') AS tion_words,
       CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS BIGINT) AS n_double_vowels
FROM documents
WHERE doc_id <= 150
ORDER BY doc_id
""",
)
def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all → array of all matches (vs the first-match
    variant in scalar_regexp_funcs)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 150)
    return d.select(
        "doc_id",
        F.array_join(F.regexp_extract_all("text", F.lit("[a-z]*tion"), 0), ",").alias("tion_words"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]{2}"), 0)).cast("bigint").alias(
            "n_double_vowels"
        ),
    ).orderBy("doc_id")


@register(
    "scalar_date_funcs",
    tags=("scalar", "date"),
    oracle="""
SELECT
  o_orderkey,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dy,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
  CAST(datediff('day', o_orderdate, TIMESTAMP '1998-12-01 00:00:00') AS BIGINT) AS days_to_end,
  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
WHERE o_orderkey <= 1000
ORDER BY o_orderkey
""",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar surface: trunc/add/diff/extract over order dates."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dy"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("1998-12-01").cast("date"), d.cast("date")).cast("bigint").alias("days_to_end"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        F.unix_timestamp(d).cast("bigint").alias("epoch_s"),
    ).orderBy("o_orderkey")


@register(
    "scalar_math_funcs",
    tags=("scalar", "math"),
    oracle="""
SELECT
  s_suppkey,
  ROUND(ABS(s_acctbal - 5000), 6) AS abs_centered,
  CAST(FLOOR(s_acctbal) AS BIGINT) AS bal_floor,
  CAST(CEIL(s_acctbal) AS BIGINT) AS bal_ceil,
  ROUND(SQRT(ABS(s_acctbal)), 6) AS bal_sqrt,
  ROUND(POW(s_acctbal / 1000, 2), 6) AS bal_pow,
  ROUND(LN(ABS(s_acctbal) + 1), 6) AS bal_ln,
  ROUND(LOG10(ABS(s_acctbal) + 1), 6) AS bal_log10,
  ROUND(EXP(s_acctbal / 10000), 6) AS bal_exp,
  CAST(SIGN(s_acctbal - 5000) AS BIGINT) AS bal_sign,
  CAST(s_suppkey % 7 AS BIGINT) AS key_mod,
  ROUND(GREATEST(s_acctbal, 5000.0), 6) AS bal_hi,
  ROUND(LEAST(s_acctbal, 5000.0), 6) AS bal_lo
FROM supplier
ORDER BY s_suppkey
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: abs/ceil/floor/round/power/mod/log family."""
    s = load(spark, sf_dir, "supplier")
    b = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.round(F.abs(b - 5000), 6).alias("abs_centered"),
        F.floor(b).cast("bigint").alias("bal_floor"),
        F.ceil(b).cast("bigint").alias("bal_ceil"),
        F.round(F.sqrt(F.abs(b)), 6).alias("bal_sqrt"),
        F.round(F.pow(b / 1000, 2), 6).alias("bal_pow"),
        F.round(F.log(F.abs(b) + 1), 6).alias("bal_ln"),
        F.round(F.log10(F.abs(b) + 1), 6).alias("bal_log10"),
        F.round(F.exp(b / 10000), 6).alias("bal_exp"),
        F.signum(b - 5000).cast("bigint").alias("bal_sign"),
        (F.col("s_suppkey") % 7).cast("bigint").alias("key_mod"),
        F.round(F.greatest(b, F.lit(5000.0)), 6).alias("bal_hi"),
        F.round(F.least(b, F.lit(5000.0)), 6).alias("bal_lo"),
    ).orderBy("s_suppkey")


@register(
    "scalar_conditional_null",
    tags=("scalar", "conditional"),
    oracle="""
SELECT
  c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS bal_band,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<masked>') AS seg_masked,
  CAST(COALESCE(NULLIF(c_nationkey, 0), -1) AS BIGINT) AS nation_or_neg1,
  CAST(CASE WHEN isnan(c_acctbal / NULLIF(c_nationkey, c_nationkey)) THEN 1 ELSE 0 END AS BIGINT) AS div_null_isnan,
  CAST(IF(c_acctbal > 5000, 1, 0) AS BIGINT) AS above_5k
FROM customer
WHERE c_custkey <= 400
ORDER BY c_custkey
""",
)
def scalar_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/nvl conditional-null scalar semantics."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("<masked>")).alias("seg_masked"),
        F.coalesce(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).cast("bigint").alias("nation_or_neg1"),
        # x / NULL is NULL (not NaN) in both engines -> isnan(NULL) is
        # NULL -> CASE falls through to 0
        F.when(F.isnan(bal / F.nullif(F.col("c_nationkey"), F.col("c_nationkey"))), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("div_null_isnan"),
        F.when(bal > 5000, 1).otherwise(0).cast("bigint").alias("above_5k"),
    ).orderBy("c_custkey")


@register(
    "scalar_xml_roundtrip",
    tags=("scalar", "xml"),
    oracle="""
SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
       COUNT(*) AS n,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
)
def scalar_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML serialize → parse round-trip (Spark 4 to_xml/from_xml):
    encode each nation row as an XML document, parse it back with an
    explicit schema, and aggregate the PARSED fields — the oracle
    aggregates the original table, so the hash check proves the XML
    codec preserved every value (the B2B-feed ingestion path, XML
    being the one legacy interchange format parquet never displaced).

    Scale: both directions are stateless row expressions inside
    whole-stage codegen — no shuffle is added; schema-explicit
    from_xml (never schema inference) keeps the parse a single pass.
    """
    n = load(spark, sf_dir, "nation")
    xml = n.select(
        F.to_xml(
            F.struct(
                F.col("n_nationkey").cast("int").alias("k"),
                F.col("n_name").alias("name"),
                F.col("n_regionkey").cast("int").alias("rk"),
            )
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml("doc", "k INT, name STRING, rk INT").alias("s")
    )
    return (
        parsed.groupBy(F.col("s.rk").cast("bigint").alias("n_regionkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s.k").cast("bigint").alias("key_sum"),
            F.min("s.name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "scalar_url_parse",
    tags=("scalar", "string"),
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || lang
           || '?id=' || CAST(doc_id AS VARCHAR) || '&v=2' AS url
  FROM documents WHERE doc_id <= 200
)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param,
       regexp_extract(url, '^([a-z]+):', 1) AS protocol
FROM u
ORDER BY doc_id
""",
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via Spark's parse_url family (HOST / PATH /
    QUERY / QUERY:key / PROTOCOL) over deterministically constructed
    URLs — the log-analytics scalar tier. The oracle decomposes the
    same URLs with anchored regexes, so the hash pins parse_url's
    component semantics exactly.

    Scale: parse_url is JVM codegen (one pass per row, no UDF) —
    the correct tool against regexp_extract chains that rescan the
    string per component."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
    ).orderBy("doc_id")


@register(
    "scalar_try_functions",
    tags=("scalar", "dq"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity / NULLIF(l_discount, 0.0) AS DOUBLE) AS qty_per_disc,
       TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
       TRY_CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT) AS line_as_int,
       CAST(CASE WHEN l_linenumber = 0 THEN NULL
                 ELSE l_orderkey % l_linenumber END AS BIGINT) AS key_mod_line
FROM lineitem
WHERE l_orderkey <= 300
ORDER BY l_orderkey, l_linenumber
""",
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (try_divide / try_cast / try_mod) —
    the ANSI-mode production-hardening tier: divide-by-zero and bad
    casts yield NULL instead of failing the 100 TB job at row
    3-billion-something. The oracle expresses the identical semantics
    with NULLIF guards and TRY_CAST.

    Scale: these compile to the same codegen as their unsafe
    siblings plus a branch — the cost of not re-running a 6-hour
    pipeline because one malformed row slipped through upstream DQ.
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_quantity"), F.col("l_discount")).alias("qty_per_disc"),
        F.expr("try_cast(l_returnflag AS BIGINT)").alias("flag_as_int"),
        F.expr("try_cast(CAST(l_linenumber AS STRING) AS BIGINT)").alias("line_as_int"),
        F.expr("try_mod(l_orderkey, l_linenumber)").cast("bigint").alias("key_mod_line"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "scalar_url_canonicalize",
    tags=("scalar", "string", "dedup", "llm-pipe"),
    oracle="""
WITH d AS (SELECT doc_id, source, lang FROM documents WHERE doc_id <= 150),
raw AS (
  SELECT doc_id, u.url FROM d CROSS JOIN LATERAL (
    SELECT unnest(ARRAY[
      'https://WWW.' || source || '.Example.COM:443/docs/' || lang || '/?id=' || CAST(doc_id AS VARCHAR) || '&utm_source=x&v=2',
      'https://www.' || source || '.example.com/docs/' || lang || '?v=2&id=' || CAST(doc_id AS VARCHAR),
      'https://www.' || source || '.example.com/docs/' || lang || '/?id=' || CAST(doc_id AS VARCHAR) || '&v=2&utm_campaign=y'
    ]) AS url
  ) u
),
canon AS (
  SELECT doc_id,
         'https://' || lower(regexp_extract(url, 'https://([^/:?]+)', 1))
         || regexp_replace(regexp_extract(url, 'https://[^/?]+(/[^?]*)', 1), '/$', '')
         || '?' || array_to_string(
              list_sort(list_filter(string_split(regexp_extract(url, '\\?(.*)$', 1), '&'),
                                    p -> p NOT LIKE 'utm_%')), '&') AS canon_url
  FROM raw
)
SELECT doc_id, canon_url, COUNT(*) AS n_variants
FROM canon GROUP BY doc_id, canon_url ORDER BY doc_id
""",
)
def scalar_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the web-corpus dedup precursor every
    crawl pipeline runs before exact/near dedup: lowercase the host,
    drop the default port, strip the trailing slash, remove
    ``utm_*`` tracking parameters and SORT the remaining query params
    so syntactic variants of the same resource collapse to one key.
    Three deliberately-messy variants per document (mixed-case host
    +:443 +utm_source / param-reordered / trailing-slash +utm_campaign)
    all canonicalize to the same URL — n_variants = 3 per doc is
    hash-pinned, so a canonicalizer that misses any rule breaks the
    check. Composes with dedup_exact_by_hash keyed on canon_url.

    Scale: pure JVM codegen (parse_url + higher-order array ops per
    row, no UDF, no shuffle before the final key group-by) — a
    trillion-URL canonicalization is scan-bound.
    """
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 150)
    mk = lambda *parts: F.concat(*[p if isinstance(p, F.Column) else F.lit(p) for p in parts])  # noqa: E731
    did = F.col("doc_id").cast("string")
    raw = d.select(
        "doc_id",
        F.explode(
            F.array(
                mk("https://WWW.", F.col("source"), ".Example.COM:443/docs/", F.col("lang"), "/?id=", did, "&utm_source=x&v=2"),
                mk("https://www.", F.col("source"), ".example.com/docs/", F.col("lang"), "?v=2&id=", did),
                mk("https://www.", F.col("source"), ".example.com/docs/", F.col("lang"), "/?id=", did, "&v=2&utm_campaign=y"),
            )
        ).alias("url"),
    )
    host = F.lower(F.parse_url("url", F.lit("HOST")))
    path = F.regexp_replace(F.parse_url("url", F.lit("PATH")), "/$", "")
    params = F.filter(
        F.split(F.parse_url("url", F.lit("QUERY")), "&"),
        lambda p: ~p.startswith("utm_"),
    )
    canon = F.concat(
        F.lit("https://"), host, path, F.lit("?"), F.array_join(F.array_sort(params), "&")
    )
    return (
        raw.select("doc_id", canon.alias("canon_url"))
        .groupBy("doc_id", "canon_url")
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .orderBy("doc_id")
    )

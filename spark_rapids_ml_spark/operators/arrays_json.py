"""Array / higher-order-function / JSON surface.

Arrays come from ``split(documents.text)`` and the float64-list
``embeddings.embedding``; JSON from ``events.props``. Higher-order
functions (transform / aggregate / zip_with / filter) run JVM-side —
this is how the engine does per-row vector math without Python UDFs
(cf. similarity.py), keeping the hot path in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "array_basic_ops",
    tags=("array",),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       toks[1] AS first_tok,
       toks[-1] AS last_tok,
       CAST(CASE WHEN list_contains(toks, 'data') THEN 1 ELSE 0 END AS BIGINT) AS has_data,
       array_to_string(toks[1:3], '|') AS first3,
       array_to_string(list_sort(toks[1:5]), ' ') AS sorted5
FROM t
WHERE doc_id <= 200
ORDER BY doc_id
""",
)
def array_basic_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction, size, contains, element_at basics."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.when(F.array_contains(toks, "data"), 1).otherwise(0).cast("bigint").alias("has_data"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.array_join(F.array_sort(F.slice(toks, 1, 5)), " ").alias("sorted5"),
    ).orderBy("doc_id")


@register(
    "array_explode_tokens",
    tags=("array",),
    bench=True,
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS df
FROM tok
GROUP BY token
HAVING COUNT(*) >= 10
ORDER BY n DESC, token
""",
)
def array_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → re-aggregate: the scan→flatMap→shuffle wordcount shape.

    Scale: explode multiplies rows ~100x; partial aggregation on token
    collapses it back before shuffle, so the exchange carries only the
    vocabulary, not the token stream.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("df"))
        .where(F.col("n") >= 10)
        .orderBy(F.col("n").desc(), F.col("token"))
    )


@register(
    "array_posexplode",
    tags=("array",),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id <= 20)
SELECT doc_id, CAST(u.g - 1 AS BIGINT) AS pos, toks[CAST(u.g AS INT)] AS token
FROM t CROSS JOIN LATERAL (SELECT unnest(generate_series(1, least(len(toks), 5)))) u(g)
ORDER BY doc_id, pos
""",
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — position-preserving array flattening."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 20)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .where(F.col("pos") <= 4)
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")
        .orderBy("doc_id", "pos")
    )


@register(
    "array_higher_order_vec",
    tags=("array", "vector"),
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sum,
       ROUND(SQRT(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm,
       ROUND(list_aggregate(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE))), 'max'), 6) AS linf_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
FROM embeddings
ORDER BY vec_id
""",
)
def array_higher_order_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math via higher-order functions — JVM-side, no UDF.

    The aggregate/transform lambdas run inside codegen; this is the
    engine's scalable per-row vector kernel (cf. the reference's
    per-partition GEMM staging, RapidsRowMatrix.scala:177-199, which
    our similarity/PCA operators replace with Arrow batches).
    """
    e = load(spark, sf_dir, "embeddings")
    xd = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    emb = xd(F.col("embedding"))
    sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.aggregate(emb, F.lit(0.0), lambda a, x: a + x), 6).alias("vec_sum"),
        F.round(F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x)), 6).alias("l2_norm"),
        F.round(
            F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))), 6
        ).alias("linf_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"),
    ).orderBy("vec_id")


@register(
    "array_set_ops",
    tags=("array",),
    oracle="""
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ')[1:10] AS a,
         string_split(text, ' ')[6:15] AS b
  FROM documents WHERE doc_id <= 100
)
SELECT doc_id,
       array_to_string(list_sort(list_distinct(list_intersect(a, b))), ',') AS inter,
       CAST(len(list_distinct(list_concat(a, b))) AS BIGINT) AS union_size,
       array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ',') AS a_minus_b,
       array_to_string(flatten([a[1:2], b[1:2]]), ',') AS flat_heads
FROM t
ORDER BY doc_id
""",
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: intersect/union/except/flatten over token
    slices (cross-engine: results canonicalized by sort+distinct)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    t = d.select(
        "doc_id",
        F.slice(F.split("text", " "), 1, 10).alias("a"),
        F.slice(F.split("text", " "), 6, 10).alias("b"),
    )
    return t.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(F.array_intersect("a", "b"))), ",").alias("inter"),
        F.size(F.array_distinct(F.concat("a", "b"))).cast("bigint").alias("union_size"),
        F.array_join(F.array_sort(F.array_distinct(F.array_except("a", "b"))), ",").alias("a_minus_b"),
        F.array_join(F.flatten(F.array(F.slice("a", 1, 2), F.slice("b", 1, 2))), ",").alias("flat_heads"),
    ).orderBy("doc_id")


@register(
    "json_extract_events",
    tags=("json",),
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
FROM events
WHERE event_id <= 500
ORDER BY event_id
""",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object path extraction from the events props column."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    ).orderBy("event_id")


@register(
    "json_from_json_agg",
    tags=("json", "agg"),
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def json_from_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parse (from_json) then aggregate."""
    e = load(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k BIGINT").alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.sum("p.k").cast("bigint").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "json_variant_extract",
    tags=("json", "variant"),
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decile,
       COUNT(*) AS n,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
ORDER BY k_decile
""",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion: parse the JSON props column ONCE into
    the binary VARIANT encoding, then extract typed fields with
    variant_get path expressions — the semi-structured-column pattern
    that replaces per-access get_json_object re-parsing (cf.
    json_extract_events, which re-parses per expression).

    Scale: VARIANT's binary encoding is parsed once at ingest and
    shredded columnar in parquet; typed-path extraction is a pointer
    walk, not a string parse — at 100 TB of event payloads the parse
    happens once per row instead of once per (row × expression).
    """
    e = load(spark, sf_dir, "events")
    parsed = e.select(
        F.parse_json("props").alias("v"),
        F.col("value"),
    )
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    return (
        parsed.select(
            k.alias("k"),
            F.expr("variant_get(v, '$.k', 'bigint') div 10").alias("k_decile"),
            "value",
        )
        .groupBy("k_decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("bigint").alias("k_min"),
            F.max("k").cast("bigint").alias("k_max"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("k_decile")
    )

"""Set operations: UNION ALL / UNION / INTERSECT / EXCEPT / distinct.

Scale notes (100 TB): UNION ALL is free (plan concatenation, no
shuffle). The distinct-flavored ops all shuffle on the full row; at
scale prefer pre-aggregated keys (as these queries do — they operate
on projected key columns, not whole fact rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


def _cust_nations(spark, sf_dir) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").cast("bigint").alias("nationkey"))
    )


def _supp_nations(spark, sf_dir) -> DataFrame:
    return (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").cast("bigint").alias("nationkey"))
    )


_CUST_SQL = "SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer WHERE c_acctbal > 9000"
_SUPP_SQL = "SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier WHERE s_acctbal > 5000"


@register(
    "setop_union_all",
    tags=("setop",),
    oracle=f"""
SELECT nationkey, COUNT(*) AS n
FROM ({_CUST_SQL} UNION ALL {_SUPP_SQL})
GROUP BY nationkey ORDER BY nationkey
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) of two order slices."""
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).orderBy("nationkey")


@register(
    "setop_union_distinct",
    tags=("setop",),
    oracle=f"SELECT nationkey FROM ({_CUST_SQL} UNION {_SUPP_SQL}) ORDER BY nationkey",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — set union with the dedup shuffle."""
    return (
        _cust_nations(spark, sf_dir)
        .union(_supp_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


@register(
    "setop_intersect",
    tags=("setop",),
    oracle=f"SELECT nationkey FROM ({_CUST_SQL} INTERSECT {_SUPP_SQL}) ORDER BY nationkey",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — distinct rows present on both sides."""
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "setop_except",
    tags=("setop",),
    oracle=f"SELECT nationkey FROM ({_CUST_SQL} EXCEPT {_SUPP_SQL}) ORDER BY nationkey",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — distinct rows on the left absent from the right."""
    # subtract == SQL EXCEPT (distinct semantics); exceptAll would keep
    # multiplicity differences, which is a different operator.
    return (
        _cust_nations(spark, sf_dir)
        .subtract(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "setop_distinct_rows",
    tags=("setop",),
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
ORDER BY o_orderstatus, o_orderpriority
""",
)
def setop_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projected key set (the dedup shuffle)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "setop_bag_except_intersect_all",
    tags=("setop",),
    oracle=f"""
SELECT op, nationkey, COUNT(*) AS n FROM (
  SELECT 'except_all' AS op, nationkey
  FROM ({_CUST_SQL} EXCEPT ALL {_SUPP_SQL})
  UNION ALL
  SELECT 'intersect_all' AS op, nationkey
  FROM ({_CUST_SQL} INTERSECT ALL {_SUPP_SQL})
)
GROUP BY op, nationkey
ORDER BY op, nationkey
""",
)
def setop_bag_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set ops (EXCEPT ALL / INTERSECT ALL): multiset
    difference and intersection preserve multiplicities — the variants
    the distinct-flavored setop_except/setop_intersect can't express
    (a key appearing 5x on the left and 2x on the right survives 3x /
    matches 2x). Spark's exceptAll/intersectAll vs DuckDB's native
    EXCEPT ALL / INTERSECT ALL.

    Scale: both plan as a count-per-row-value aggregation + replicate
    (one shuffle on the projected key, like a group-by) — NOT a join
    explosion; same state bound as distinct, plus a multiplicity
    counter.
    """
    c = _cust_nations(spark, sf_dir)
    s = _supp_nations(spark, sf_dir)
    ex = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    it = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    return ex.unionByName(it).orderBy("op", "nationkey")


@register(
    "setop_union_schema_evolution",
    tags=("setop", "source", "scale"),
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_totalprice
  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
),
v2 AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
),
merged AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM v1
  UNION ALL
  SELECT * FROM v2
)
SELECT COALESCE(o_orderpriority, '<pre-evolution>') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM merged
GROUP BY 1
ORDER BY priority
""",
)
def setop_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — reading history written BEFORE a
    column existed together with data written after:
    unionByName(allowMissingColumns=True) aligns by NAME and fills
    the missing column with NULL, the semantics positional UNION ALL
    gets silently wrong when column order drifts. Old rows surface
    under an explicit '<pre-evolution>' bucket.

    Scale: schema evolution is the normal state of a years-old 100 TB
    table (Parquet mergeSchema at scan, by-name union at plan level);
    by-name alignment costs nothing at runtime — it is resolved at
    analysis time, the scan and shuffle are identical to the
    homogeneous case.
    """
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1996-01-01").cast("timestamp")
    v1 = o.where(F.col("o_orderdate") < cutoff).select("o_orderkey", "o_totalprice")
    v2 = o.where(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return (
        merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("priority")
    )

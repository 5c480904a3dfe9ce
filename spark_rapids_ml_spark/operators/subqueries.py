"""Subquery surface: scalar, IN, correlated EXISTS / NOT EXISTS.

Expressed in Spark SQL so Catalyst's subquery decorrelation rewrites
them into joins (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery)
— at scale these execute as broadcast or shuffle joins, never
per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "subquery_scalar",
    tags=("subquery",),
    oracle="""
SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
      (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(18,2)) FROM customer) * 1.8
ORDER BY c_custkey
""",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (corpus average) in a filter."""
    # threshold computed in exact decimal so both engines filter on the
    # identical constant
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
        FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
              (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(18,2)) FROM customer) * 1.8
        ORDER BY c_custkey
        """
    )


@register(
    "subquery_in",
    tags=("subquery",),
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
  AND o_totalprice > 350000
ORDER BY o_orderkey
""",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — semi-join rewrite by Catalyst."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
          AND o_totalprice > 350000
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_exists_correlated",
    tags=("subquery",),
    oracle="""
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
)
ORDER BY s_suppkey
""",
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated to a semi-join."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
        ORDER BY s_suppkey
        """
    )


@register(
    "subquery_not_exists_correlated",
    tags=("subquery",),
    oracle="""
SELECT c_custkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
ORDER BY c_custkey
""",
)
def subquery_not_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS — decorrelated to an anti-join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
        ORDER BY c_custkey
        """
    )


@register(
    "subquery_correlated_scalar_agg",
    tags=("subquery",),
    oracle="""
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS price,
       (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
FROM orders o
WHERE o_orderkey <= 1000
ORDER BY o_orderkey
""",
)
def subquery_correlated_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery per outer row."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
        FROM orders o
        WHERE o_orderkey <= 1000
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_lateral_topn",
    tags=("subquery", "lateral"),
    oracle="""
SELECT c.c_custkey,
       t.o_orderkey,
       CAST(t.o_totalprice AS DOUBLE) AS price,
       t.rk
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
WHERE c.c_custkey <= 200
ORDER BY c.c_custkey, t.rk
""",
)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — per-customer top-3 orders via a
    correlated derived table (the SQL-standard alternative to a window
    + filter). Catalyst decorrelates the lateral join into a ranked
    join under DomainJoin rewriting rather than re-executing the inner
    query per outer row.

    Scale: decorrelation turns the apparent nested loop into one
    shuffle on the join key plus a per-key group-limit — the same plan
    family as window_topk_per_group; without it a lateral join is
    O(outer × inner-scan) and unusable at 100 TB.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey,
               t.o_orderkey,
               CAST(t.o_totalprice AS DOUBLE) AS price,
               t.rk
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        WHERE c.c_custkey <= 200
        ORDER BY c.c_custkey, t.rk
        """
    )


@register(
    "sql_recursive_cte_hierarchy",
    tags=("sql", "recursive"),
    oracle="""
WITH RECURSIVE walk AS (
  SELECT n_nationkey AS nk, n_nationkey AS cur, 0 AS depth,
         CAST(n_nationkey AS BIGINT) AS key_sum
  FROM nation
  UNION ALL
  SELECT nk, cur // 2, depth + 1, key_sum + cur // 2
  FROM walk WHERE cur > 0
)
SELECT w.nk AS n_nationkey, n.n_name,
       CAST(MAX(w.depth) AS BIGINT) AS depth_to_root,
       CAST(MAX(w.key_sum) AS BIGINT) AS path_key_sum
FROM walk w JOIN nation n ON n.n_nationkey = w.nk
GROUP BY w.nk, n.n_name
ORDER BY n_nationkey
""",
)
def sql_recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): walk a derived parent hierarchy
    (parent(k) = k div 2, rooted at 0) from every nation key to the
    root, computing depth and the path key sum — the WITH RECURSIVE
    surface for hierarchy/graph walks that previously required
    iterative DataFrame loops (cf. graph.py's label propagation).

    Scale: each recursion step is one self-join shuffle, exactly like
    a hand-written iteration; depth is bounded by log2(max key). For
    unbounded/mutual recursion at 100 TB the iterative operators
    (graph.py, dedup.py clusters) remain the managed path — this query
    pins the declarative parity.
    """
    _views(spark, sf_dir, "nation")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT CAST(n_nationkey AS BIGINT) AS nk,
                 CAST(n_nationkey AS BIGINT) AS cur,
                 CAST(0 AS BIGINT) AS depth,
                 CAST(n_nationkey AS BIGINT) AS key_sum
          FROM nation
          UNION ALL
          SELECT nk, cur DIV 2, depth + CAST(1 AS BIGINT), key_sum + cur DIV 2
          FROM walk WHERE cur > 0
        )
        SELECT w.nk AS n_nationkey, n.n_name,
               CAST(MAX(w.depth) AS BIGINT) AS depth_to_root,
               CAST(MAX(w.key_sum) AS BIGINT) AS path_key_sum
        FROM walk w JOIN nation n ON n.n_nationkey = w.nk
        GROUP BY w.nk, n.n_name
        ORDER BY n_nationkey
        """
    )


@register(
    "subquery_quantified_all_any",
    tags=("subquery", "sql"),
    oracle="""
WITH p AS (SELECT o_totalprice FROM orders WHERE o_orderstatus = 'P'),
     nope AS (SELECT o_totalprice FROM orders WHERE o_orderstatus = 'X')
SELECT COUNT(*) FILTER (o_totalprice > ALL (SELECT o_totalprice FROM p)) AS n_gt_all_p,
       COUNT(*) FILTER (o_totalprice >= ANY (SELECT o_totalprice FROM p)) AS n_ge_any_p,
       COUNT(*) FILTER (o_totalprice < ALL (SELECT o_totalprice FROM p)) AS n_lt_all_p,
       COUNT(*) FILTER (o_totalprice > ALL (SELECT o_totalprice FROM nope)) AS n_gt_all_empty,
       COUNT(*) AS total
FROM orders
""",
)
def subquery_quantified_all_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries (> ALL / >= ANY / < ALL) —
    SQL surface Spark has NO native predicate for; expressed
    Spark-first as the MIN/MAX rewrite with the empty-set corner
    handled explicitly: `x > ALL (S)` is `x > max(S) OR S = empty`
    (vacuously true), `x >= ANY (S)` is `x >= min(S) AND S nonempty`.
    The 'nope' branch pins the vacuous-truth semantics the naive
    rewrite (`x > max(S)` alone, NULL when S is empty) silently gets
    wrong. The oracle runs DuckDB's native ALL/ANY.

    Scale: each subquery collapses to a 1-row (min, max, count)
    aggregate broadcast to the probe scan — O(1) state, no join; the
    quantified predicate family never needs the O(N^2) comparison its
    syntax suggests. (Subquery columns here are non-null; a nullable
    S adds the three-valued branch join_null_aware_anti pins for IN.)
    """
    o = load(spark, sf_dir, "orders")
    p = o.where(F.col("o_orderstatus") == "P").agg(
        F.max("o_totalprice").alias("p_max"),
        F.min("o_totalprice").alias("p_min"),
        F.count(F.lit(1)).alias("p_cnt"),
    )
    nope = o.where(F.col("o_orderstatus") == "X").agg(
        F.max("o_totalprice").alias("x_max"),
        F.count(F.lit(1)).alias("x_cnt"),
    )
    joined = o.crossJoin(F.broadcast(p)).crossJoin(F.broadcast(nope))  # 1-row aggs
    gt_all_p = (F.col("p_cnt") == 0) | (F.col("o_totalprice") > F.col("p_max"))
    ge_any_p = (F.col("p_cnt") > 0) & (F.col("o_totalprice") >= F.col("p_min"))
    lt_all_p = (F.col("p_cnt") == 0) | (F.col("o_totalprice") < F.col("p_min"))
    gt_all_empty = (F.col("x_cnt") == 0) | (F.col("o_totalprice") > F.col("x_max"))
    return joined.agg(
        F.count(F.when(gt_all_p, 1)).alias("n_gt_all_p"),
        F.count(F.when(ge_any_p, 1)).alias("n_ge_any_p"),
        F.count(F.when(lt_all_p, 1)).alias("n_lt_all_p"),
        F.count(F.when(gt_all_empty, 1)).alias("n_gt_all_empty"),
        F.count(F.lit(1)).alias("total"),
    )


@register(
    "sql_pipe_syntax_flow",
    tags=("sql", "spark4"),
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_quantity < 10
GROUP BY l_returnflag
HAVING COUNT(*) > 100
ORDER BY l_returnflag
""",
)
def sql_pipe_syntax_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, the |> operator chain): the same
    scan -> filter -> aggregate -> having -> order flow as classic
    SQL, written as a linear pipeline in evaluation order — the
    GoogleSQL-derived surface that removes the inside-out reading of
    nested SELECTs. The oracle is the classic-SQL formulation, so the
    hash check pins that the pipe chain lowers to the identical
    semantics (it shares Catalyst's logical plan).

    Scale: purely front-end syntax — the plan is the same partial-agg
    + exchange shape as q1/agg_having; nothing new to audit.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity < 10
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag
        |> WHERE n > 100
        |> SELECT l_returnflag, n, revenue
        |> ORDER BY l_returnflag
        """
    )


@register(
    "sql_parameterized_query",
    tags=("sql", "spark4"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice > 250000 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args={...})): the
    injection-safe templating surface — parameter markers are bound
    as typed literals by the analyzer, never string-spliced, so a
    hostile value cannot change the query shape. The oracle inlines
    the same constants, pinning marker binding to literal semantics.

    Scale: parameters are analyzer-time constants, so constant
    folding and predicate pushdown see them exactly as literals —
    the parameterized form loses zero optimization.
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"min_price": 250000, "status": "F"},
    )


@register(
    "scalar_collation_group",
    tags=("scalar", "string", "spark4"),
    oracle="""
SELECT lower(mixed) AS norm_type, COUNT(*) AS n
FROM (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE lower(p_type) END AS mixed
  FROM part
)
GROUP BY lower(mixed)
ORDER BY norm_type
""",
)
def scalar_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE UNICODE_CI): a
    case-scrambled key (upper on even part keys, lower on odd) groups
    under the case-insensitive collation WITHOUT any normalizing
    expression — the engine's comparator, not a lower() rewrite, does
    the merge. The oracle IS the lower() rewrite, so the hash check
    pins collated grouping to normalize-then-group semantics; the
    output key is normalized on both sides for display.

    Scale: collation is comparator metadata on the exchange/agg keys
    — same shuffle plan as any group-by; no expression evaluation per
    comparison beyond the ICU key, and no double-scan normalization
    pass (the win at 100 TB: group/join case-insensitively without
    materializing a normalized copy of the column).
    """
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT lower(MIN(mixed)) AS norm_type, COUNT(*) AS n
        FROM (
          SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                      ELSE lower(p_type) END COLLATE UNICODE_CI AS mixed
          FROM part
        )
        GROUP BY mixed
        ORDER BY norm_type
        """
    )


@register(
    "sql_group_by_all",
    tags=("sql", "surface"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
FROM orders
GROUP BY ALL
ORDER BY ALL
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the analyst-ergonomics SQL surface
    Spark and DuckDB both adopted): every non-aggregate select item is
    inferred as a grouping key, and ORDER BY ALL sorts by the whole
    select list left-to-right — a total order here since the grouping
    keys lead it. The SAME SQL text runs on both engines, so the query
    pins that the inference rules agree.

    Scale: resolves at analysis time to an ordinary partial-aggregable
    groupBy — zero runtime cost over writing the keys out.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total
FROM orders
GROUP BY ALL
ORDER BY ALL
"""
    )

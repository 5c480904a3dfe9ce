"""Flagship analytical queries (TPC-H-style) over the star schema.

These are the headline end-to-end queries: scan → filter → join →
aggregate → sort, written declaratively so Catalyst supplies predicate
pushdown, column pruning, partial aggregation and join planning.

Scale notes (100 TB):
- q1: single scan + hash agg on low-cardinality keys (≤6 groups) —
  partial aggregation makes the shuffle a few KB regardless of input
  size; the only full pass is the parquet scan with a pushed-down
  date filter.
- q3/q5: fact-fact joins shuffle on join keys; region/nation are
  broadcast (bounded size by schema), larger dims left to AQE which
  will broadcast when the runtime size is under the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.functions.portable import davg, dsum, sql_davg, sql_dsum
from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load, load_wide

Q1_CUTOFF = "1998-09-01"


@register(
    "q1_pricing_summary",
    tags=("relational", "agg"),
    bench=True,
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity', 'sum_qty')},
  {sql_dsum('l_extendedprice', 'sum_base_price')},
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  {sql_davg('l_quantity', 'avg_qty')},
  {sql_davg('l_extendedprice', 'avg_price')},
  {sql_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Reference parity note: the reference engine has no relational
    surface (SURVEY.md §2.A) — this query anchors the declared
    relational contract (§2.B: scan, filter pushdown, group-by agg,
    exact decimal arithmetic, total order).
    """
    # widened (§2.5 gate): one heavy exact-decimal aggregation consumes
    # the scan exactly once — interleaved A/B at sf0.1: 1.42s -> 0.85s
    li = load_wide(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit(f"{Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(d("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                d("l_extendedprice")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
                * (F.lit(1) + F.col("l_tax")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    tags=("relational", "join", "agg"),
    bench=True,
    oracle="""
SELECT
  l.l_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue.

    Scale: customer(filtered) joins orders then lineitem; AQE picks
    broadcast for the filtered customer side when small, else
    shuffle-hash on the key. Top-k via global sort+limit — Spark
    executes this as TakeOrderedAndProject (no full sort at scale).
    """
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    tags=("relational", "join", "agg"),
    bench=True,
    oracle="""
SELECT
  n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by supplier nation within a region.

    Scale: region/nation are explicitly broadcast (bounded
    cardinality); the fact-fact joins shuffle on orderkey/suppkey.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q4_order_priority",
    tags=("relational", "subquery", "agg"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1993-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1993-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: priority counts for late-shipping orders — correlated
    EXISTS decorrelated by Catalyst into a left-semi join."""
    from spark_rapids_ml_spark.sources.catalog import load as _load

    _load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1993-07-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1993-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q7_volume_shipping",
    tags=("relational", "join", "agg"),
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l.l_shipdate) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.

    Scale: two broadcast nation joins with a disjunctive cross-nation
    predicate; fact joins shuffle on their keys.
    """
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        s.join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q18_large_volume_customer",
    tags=("relational", "subquery", "agg"),
    bench=True,
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders — IN over a grouped
    HAVING subquery, planned as a semi-join against the aggregate."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    # NOT widened (r14): the r13 claim that ReusedExchange dedupes the
    # two lineitem widening exchanges is false — the AQE FINAL plan
    # (executedPlan after a noop action) shows two separate
    # REPARTITION_BY_NUM exchanges and zero ReusedExchange nodes, one
    # of them feeding a BroadcastExchange (shuffling 600k rows that are
    # then collected anyway). The r13 A/B delta (1.27->1.16s) was
    # inside the host-noise band; multi-consumer scans stay unwidened
    # (the r13 negative result: widening is per-consumer-count).
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .where(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q6_forecast_revenue",
    tags=("relational", "filter", "agg"),
    oracle="""
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — the pushdown showcase.

    All four predicates reach the parquet reader (PushedFilters);
    only 4 columns are read (ReadSchema). Global agg returns 1 row.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---- TPC-H shapes adapted to this testdata (no partsupp table exists:
# lineitem serves as the part↔supplier price/volume link) ----

def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    # load_wide: fact tables get the gated §2.5 repartition so a
    # single-row-group input cannot serialize the whole map side of a
    # join/agg pipeline onto one core (no-op at real-scale layouts)
    for n in names:
        load_wide(spark, sf_dir, n).createOrReplaceTempView(n)


_Q2_SQL = """
SELECT DISTINCT CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, s.s_name,
       n.n_name, p.p_partkey, p.p_name
FROM part p, lineitem l, supplier s, nation n, region r
WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
  AND p.p_size <= 10 AND p.p_type = 'STANDARD'
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2, supplier s2, nation n2, region r2
    WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", tags=("tpch", "subquery"), oracle=_Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-MIN subquery — which European
    supplier offers each small STANDARD part at its minimum price
    (lineitem stands in for partsupp, absent from this testdata).

    Kept in SQL form so Catalyst's RewriteCorrelatedScalarSubquery
    decorrelates it into an aggregate+join — plan-asserted in
    tests/test_plans.py (no per-row re-execution). Sort key
    (s_acctbal DESC, n_name, s_name, p_partkey) is total, so the
    LIMIT is deterministic at every sf."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_part_types", tags=("tpch", "subquery"), oracle=_Q16_SQL)
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (null-aware anti join) + COUNT(DISTINCT)
    — how many distinct suppliers ship each excluded-brand part class,
    excluding suppliers in bad standing (negative acctbal stands in for
    the %Complaints% comment filter; no s_comment in this testdata)."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, n.n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 60)
ORDER BY s_name
"""


@register("q20_part_promotion_suppliers", tags=("tpch", "subquery"), oracle=_Q20_SQL)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — suppliers who moved
    heavy volume (grouped HAVING, the availqty analogue) of red parts
    (inner IN) in a two-year window, via IN → GROUP BY/HAVING → IN.
    Catalyst plans both INs as left-semi joins."""
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20_SQL)


_Q14_SQL = """
SELECT COUNT(*) AS n_lines,
       -- both sums are EXACT decimals (price x (1-discount) in
       -- DECIMAL arithmetic); one double division at the end is the
       -- only FP op, identical in both engines
       CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


@register("q14_promotion_effect", tags=("tpch", "join"), oracle=_Q14_SQL)
def q14_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (share of revenue
    from PROMO parts in a ship-date window). Both revenue sums run in
    exact decimal so the ratio is one identical IEEE division — the
    round-trip-safe way to emit a percentage (ROUND here would be the
    cross-engine tie-break hazard)."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14_SQL)


_Q19_SQL = """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q19_discounted_revenue", tags=("tpch", "join"), oracle=_Q19_SQL)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brackets over BOTH
    join sides — the planner test case for OR-residuals: the equi-join
    on partkey must stay a hash join with the bracket disjunction as a
    post-join filter, never a nested-loop over the OR (pinned in
    tests/test_plans.py). Revenue in exact decimal as everywhere."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19_SQL)


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_rev AS DOUBLE) AS total_rev
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", tags=("tpch", "subquery"), oracle=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view + uncorrelated scalar-MAX
    subquery over that same view (the create-view formulation inlined
    as a CTE). The equality against MAX is exact — revenue sums are
    DECIMAL, so ties and the max itself are cross-engine identical;
    the double cast happens only at output."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


_Q17_SQL = """
SELECT COUNT(*) AS n_small_orders,
       -- exact decimal sum cast to double, THEN one division by an
       -- exact constant: identical IEEE doubles in both engines
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_type = 'ECONOMY'
  AND l.l_quantity < (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / (5 * COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@register("q17_small_quantity_revenue", tags=("tpch", "subquery"), oracle=_Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-AVG subquery — revenue from
    orders below 20% of a part's average quantity (p_type stands in
    for the brand+container filter; brand alone matches nothing at
    sf0.001 — 104/874/8964 qualifying rows at sf0.001/0.01/0.1).

    Cross-engine hazard handled: 0.2·AVG over doubles is summation-
    order dependent, so the threshold is written as exact-decimal
    SUM → one cast → one division by the exact integer 5·COUNT —
    bit-identical in both engines, making the strict `<` comparison
    deterministic. Catalyst decorrelates the scalar subquery into an
    aggregate+join (same rewrite as Q2)."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


_Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 320000.0)
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@register("q22_global_sales_opportunity", tags=("tpch", "subquery"), oracle=_Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (corpus-wide
    average balance) + correlated NOT EXISTS, grouped by nation
    (stands in for the phone country prefix — no c_phone here). Every
    customer in this testdata has orders, so the anti-join condition
    is "no jumbo order" (o_totalprice > 320000) — chosen so the
    NOT EXISTS genuinely binds at every sf (1/16/210 customers at
    sf0.001/0.01/0.1), not a vacuous filter. The balance threshold is
    exact-decimal sum / exact count, so the boundary is cross-engine
    stable; the anti-join decorrelates like Q21's."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


_Q21_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_supplier", tags=("tpch", "subquery"), oracle=_Q21_SQL)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: DOUBLE-correlated subqueries over the same
    fact table — suppliers who were the SOLE returned-lineitem
    supplier in a finished multi-supplier order (l_returnflag='R'
    stands in for receipt>commit lateness; those date columns don't
    exist in this testdata).

    The hard decorrelation case: one correlated EXISTS (another
    supplier touched the order) AND one correlated NOT EXISTS (no
    OTHER supplier had a return) against lineitem itself. Catalyst
    must plan a left-semi and a left-anti join on l_orderkey with the
    supplier inequality as a join residual — never per-row subquery
    re-execution (pinned in tests/test_plans.py)."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_SQL)


_Q9_SQL = """
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       -- profit stays in exact DECIMAL through the aggregate; the
       -- single cast to DOUBLE afterward is identical in both engines
       -- (scaled magnitude << 2^53 per group at every tested sf)
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(0.6 AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name NOT LIKE '%red%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("q9_product_type_profit", tags=("tpch", "join"), oracle=_Q9_SQL, bench=True)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: the 5-way join-order stress query — profit by
    nation and order-year over lineitem ⋈ part ⋈ supplier ⋈ orders ⋈
    nation with a NEGATIVE part filter (p_name NOT LIKE '%red%', so
    the planner cannot treat part as highly selective). Supply cost is
    proxied as 60% of p_retailprice × quantity (no partsupp table in
    this testdata).

    Scale: the three dimension sides (part at this testdata's scale,
    supplier, nation) broadcast under AQE; lineitem ⋈ orders is the
    one real shuffle, and the partial aggregate collapses each map
    side to ≤ nations × years rows before the exchange (plan-asserted
    in tests/test_plans.py: no cartesian product, partial agg before
    the final shuffle)."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    return spark.sql(_Q9_SQL)


_Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
       n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", tags=("tpch", "join"), oracle=_Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in a
    quarter — customer ⋈ orders ⋈ lineitem ⋈ nation, revenue in exact
    DECIMAL (one cast to double after the aggregate), top-20 by a
    deterministic (revenue DESC, custkey) key."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SQL)


_Q12_SQL = """
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY ship_class
"""


@register("q12_shipmode_priority", tags=("tpch", "agg"), oracle=_Q12_SQL)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class counts per shipping class over a
    one-year window (l_returnflag stands in for l_shipmode, which this
    testdata lacks) — the conditional-aggregation-over-join shape."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12_SQL)


_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", tags=("tpch", "join", "agg"), oracle=_Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution over ALL customers —
    the filter lives in the LEFT JOIN's ON clause (not WHERE), so
    customers with zero qualifying orders stay in the histogram at
    c_count = 0; a double aggregation follows the outer join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_SQL)


_Q8_SQL = """
SELECT o_year,
       -- numerator and denominator are both exact-decimal sums cast
       -- once to double; the division is identical IEEE in both
       -- engines, so the share is emitted UNROUNDED
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
) v
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", tags=("tpch", "join"), oracle=_Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — the widest join in the
    suite (7-way: part ⋈ lineitem ⋈ supplier ⋈ orders ⋈ customer ⋈
    nation×2 ⋈ region, nation joined twice under different roles).
    Catalyst must broadcast the five dimension sides and keep
    lineitem ⋈ orders as the only real shuffle; conditional share-of-
    total aggregation on top."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "orders",
           "customer", "nation", "region")
    return spark.sql(_Q8_SQL)


_Q11_SQL = """
SELECT l.l_partkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
GROUP BY l.l_partkey
-- above-mean filter via CROSS-MULTIPLICATION: part_value * n_parts
-- > national_total keeps everything in exact DECIMAL x BIGINT
-- arithmetic (a mean would need a decimal DIVISION, whose result
-- scale/rounding differs between engines); mean-relative, so the
-- filter discriminates at EVERY scale factor
HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * (
  SELECT COUNT(DISTINCT l2.l_partkey)
  FROM lineitem l2
  JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
  JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
  WHERE r2.r_name = 'EUROPE') > (
  SELECT SUM(CAST(l3.l_extendedprice AS DECIMAL(18,2)))
  FROM lineitem l3
  JOIN supplier s3 ON s3.s_suppkey = l3.l_suppkey
  JOIN nation n3 ON n3.n_nationkey = s3.s_nationkey
  JOIN region r3 ON r3.r_regionkey = n3.n_regionkey
  WHERE r3.r_name = 'EUROPE')
ORDER BY part_value DESC, l_partkey
"""


@register("q11_important_stock", tags=("tpch", "subquery"), oracle=_Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with a HAVING threshold against
    TWO uncorrelated scalar subqueries over the same join — keep parts
    whose regional value exceeds the regional MEAN part value
    (lineitem value stands in for partsupp stock value; the original's
    fixed 0.0001 fraction is vacuous off its own scale factor). The
    comparison cross-multiplies so everything stays exact DECIMAL —
    no FP ties, no cross-engine decimal-division scale differences;
    Catalyst computes each scalar once and broadcasts it into the
    HAVING filter."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q11_SQL)

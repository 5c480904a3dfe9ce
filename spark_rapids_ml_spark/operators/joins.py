"""Join operator surface: inner/outer/semi/anti/cross/theta/composite.

Scale notes (100 TB): equi-joins shuffle on their keys and are what
AQE optimizes best (broadcast conversion, skew splitting). The
explicit ``F.broadcast`` hints mark sides that are bounded by schema
(region/nation) or by a selective filter. The theta join is written
with an equi-key conjunct so Spark plans SortMergeJoin with the range
as a post-condition instead of a cartesian BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.functions.portable import sql_hash60
from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "join_inner_basic",
    tags=("join",),
    oracle="""
SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 300000
ORDER BY o.o_orderkey
""",
)
def join_inner_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join customer-orders (the baseline shuffle join)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "c_mktsegment", F.col("o_totalprice").cast("double"))
        .orderBy("o_orderkey")
    )


@register(
    "join_left_outer",
    tags=("join",),
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
  ON c.c_custkey = o.o_custkey
WHERE c.c_custkey <= 500
ORDER BY c.c_custkey, o.o_orderkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched left rows as nulls."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", F.col("o_totalprice").cast("double"))
        .orderBy("c_custkey", "o_orderkey")
    )


@register(
    "join_right_outer",
    tags=("join",),
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_name
FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
RIGHT JOIN (SELECT * FROM orders WHERE o_orderkey <= 2000) o
  ON c.c_custkey = o.o_custkey
ORDER BY o.o_orderkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join preserving unmatched right rows."""
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .select("o_orderkey", "c_custkey", "c_name")
        .orderBy("o_orderkey")
    )


@register(
    "join_full_outer",
    tags=("join",),
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey AS k FROM customer WHERE c_acctbal > 9900),
     sn AS (SELECT DISTINCT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000)
SELECT CAST(cn.k AS BIGINT) AS cust_nation, CAST(sn.k AS BIGINT) AS supp_nation
FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
ORDER BY cust_nation NULLS LAST, supp_nation NULLS LAST
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join preserving both unmatched sides."""
    cn = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").cast("bigint").alias("k"))
        .distinct()
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").cast("bigint").alias("k2"))
        .distinct()
    )
    return (
        cn.join(sn, cn.k == sn.k2, "full")
        .select(F.col("k").alias("cust_nation"), F.col("k2").alias("supp_nation"))
        .orderBy(F.col("cust_nation").asc_nulls_last(), F.col("supp_nation").asc_nulls_last())
    )


@register(
    "join_left_semi",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000
)
ORDER BY c_custkey
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — existence filter, no right columns."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 300000)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_left_anti",
    tags=("join",),
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
ORDER BY c_custkey
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no mega-order. The build side is filtered (every
    customer has SOME order in this testdata, so an unfiltered anti
    join is vacuously empty — 20/202/1997 rows at sf0.001/0.01/0.1)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_cross",
    tags=("join",),
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
ORDER BY r.r_name, n.n_name
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN of two bounded dims (25x5 demo; never fact-sized)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


THETA_WINDOW_ROWS = 200_000  # supplier count above which the window rewrite applies


@register(
    "join_theta_range",
    tags=("join",),
    oracle="""
-- window form of the theta join: n_richer = nation size - #(acctbal
-- <= mine, peers included) -- identical results, O(n log n) at any
-- scale (the join form is quadratic in per-nation suppliers)
WITH w AS (
  SELECT s_suppkey,
         COUNT(*) OVER (PARTITION BY s_nationkey) AS n_nat,
         COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le
  FROM supplier
)
SELECT s_suppkey, CAST(n_nat - n_le AS BIGINT) AS n_richer_same_nation
FROM w WHERE n_nat - n_le > 0
ORDER BY s_suppkey
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join with an equi conjunct.

    Scale, in two regimes: the nationkey equi-conjunct lets Spark
    hash-partition both sides and the range predicate evaluates
    post-match (test_theta_join_not_nested_loop pins the hash-join
    plan) — but the MATCH SET itself is quadratic in per-nation
    suppliers (count-of-richer semantics), so past THETA_WINDOW_ROWS
    suppliers the same result is computed as a per-nation window
    (n_richer = nation size - count(acctbal <= mine)), the rewrite a
    production optimizer applies to inequality-aggregation self-joins.
    Results are provably identical (the oracle IS the window form at
    every scale); the theta-join plan remains the demonstrated
    operator below the threshold.
    """
    sup = load(spark, sf_dir, "supplier")
    if sup.count() > THETA_WINDOW_ROWS:
        from pyspark.sql import Window

        wn = Window.partitionBy("s_nationkey")
        wle = (
            Window.partitionBy("s_nationkey")
            .orderBy("s_acctbal")
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w = sup.select(
            "s_suppkey",
            F.count(F.lit(1)).over(wn).alias("n_nat"),
            F.count(F.lit(1)).over(wle).alias("n_le"),
        )
        return (
            w.where(F.col("n_nat") - F.col("n_le") > 0)
            .select(
                "s_suppkey",
                (F.col("n_nat") - F.col("n_le")).alias("n_richer_same_nation"),
            )
            .orderBy("s_suppkey")
        )
    s1 = sup.alias("s1")
    s2 = sup.alias("s2")
    return (
        s1.join(
            s2,
            (F.col("s1.s_nationkey") == F.col("s2.s_nationkey"))
            & (F.col("s2.s_acctbal") > F.col("s1.s_acctbal")),
        )
        .groupBy(F.col("s1.s_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("n_richer_same_nation"))
        .orderBy("s_suppkey")
    )


@register(
    "join_broadcast_dim",
    tags=("join",),
    bench=True,
    oracle="""
SELECT n.n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA','EUROPE')
GROUP BY n.n_name
ORDER BY n.n_name
""",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of bounded dimension tables (no shuffle of the
    fact side at any scale — map-side hash join)."""
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE")))
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "join_composite_key_argmax",
    tags=("join", "agg"),
    oracle="""
WITH mx AS (
  SELECT l_orderkey, MAX(l_quantity) AS max_qty
  FROM lineitem GROUP BY l_orderkey
)
SELECT l.l_orderkey, l.l_linenumber, CAST(l.l_quantity AS DOUBLE) AS l_quantity
FROM lineitem l
JOIN mx ON l.l_orderkey = mx.l_orderkey AND l.l_quantity = mx.max_qty
WHERE l.l_orderkey <= 2000
ORDER BY l.l_orderkey, l.l_linenumber
""",
)
def join_composite_key_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key self-join (argmax-per-group via join-back).

    Scale: both sides share the l_orderkey partitioning, so the join
    reuses the aggregation's shuffle (no extra exchange under AQE).
    """
    l = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    mx = (
        l.groupBy("l_orderkey")
        .agg(F.max("l_quantity").alias("max_qty"))
        .withColumnRenamed("l_orderkey", "mx_orderkey")
    )
    return (
        l.join(
            mx,
            (F.col("l_orderkey") == F.col("mx_orderkey"))
            & (F.col("l_quantity") == F.col("max_qty")),
        )
        .select("l_orderkey", "l_linenumber", F.col("l_quantity").cast("double").alias("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    )


# Width of a range-join bin in days. Chosen equal to the interval span
# + 1 so every interval overlaps at most TWO bins (each interval row is
# duplicated <= 2x) while each point maps to exactly ONE bin, so a
# (point, interval) pair can meet in only the point's bin — no
# post-join dedup needed.
_RANGE_BIN_DAYS = 8
RANGE_DAYAGG_ROWS = 10_000_000  # lineitem rows above which the day-agg rewrite applies


@register(
    "join_range_binned_count",
    tags=("join", "scale"),
    oracle="""
-- day-granularity form of the range join: the point side pre-
-- aggregates to one row per ship DAY (bounded by the calendar, not
-- the corpus), each interval expands to its 8 days, and the range
-- predicate becomes an equi-join on the day -- identical results,
-- O(points + intervals) instead of O(pairs sharing a bin)
WITH p AS (
  SELECT CAST(l_shipdate AS DATE) AS pd, COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem WHERE l_quantity >= 45 GROUP BY pd
),
o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0
  FROM orders WHERE o_orderpriority = '1-URGENT'
),
d AS (
  SELECT o_orderkey,
         CAST(UNNEST(generate_series(d0, d0 + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE) AS pd
  FROM o
)
SELECT d.o_orderkey, CAST(SUM(p.n) AS BIGINT) AS n_shipped,
       CAST(SUM(p.q) AS DOUBLE) AS sum_qty
FROM d JOIN p USING (pd)
GROUP BY d.o_orderkey
ORDER BY d.o_orderkey
""",
)
def join_range_binned_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via temporal binning — the scale
    path for interval joins with NO equi-key (cf. the reference's
    row-wise comparator joins; Spark would otherwise plan a
    BroadcastNestedLoopJoin that is O(points x intervals) at any
    cluster size).

    Both sides map time to ``floor(epoch_day / BIN)`` bins sized so an
    interval spans <= 2 bins; the join becomes a plain equi-join on the
    bin key (shuffle-partitionable, AQE-skew-splittable) with the exact
    BETWEEN as a post-condition. Cost: O(pairs sharing a bin), i.e.
    data-density-bounded instead of cardinality-product-bounded; the
    <= 2x interval duplication is the only blowup, independent of
    cluster and data size. tests/test_plans.py asserts no
    cartesian/nested-loop appears.
    """
    epoch = F.lit("1970-01-01").cast("date")
    li = load(spark, sf_dir, "lineitem")
    li_rows = li.count()
    o0 = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", F.to_date("o_orderdate").alias("d0"))
    )
    p0 = (
        li.where(F.col("l_quantity") >= 45)
        .select(F.to_date("l_shipdate").alias("pd"), "l_quantity")
    )
    o = (
        o0.withColumn("d1", F.date_add("d0", 7))
        .withColumn("day0", F.datediff("d0", epoch))
        .withColumn(
            "bin",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.col("day0") / _RANGE_BIN_DAYS),
                        F.floor((F.col("day0") + F.lit(7)) / _RANGE_BIN_DAYS),
                    )
                )
            ),
        )
    )
    p = p0.withColumn("bin", F.floor(F.datediff("pd", epoch) / _RANGE_BIN_DAYS))
    if li_rows > RANGE_DAYAGG_ROWS:
        # day-granularity rewrite: pre-aggregate the point side to one
        # row per ship day (calendar-bounded), expand each interval to
        # its 8 days, equi-join on the day. Same results, linear cost —
        # the bin join's candidate set is density-bounded and density
        # grows with the corpus at a fixed time range (measured: the
        # bin join's match set goes to ~10^10 pairs at sf10).
        daily = p0.groupBy("pd").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
        days = o0.select(
            "o_orderkey",
            F.explode(F.sequence("d0", F.date_add("d0", 7))).alias("pd"),
        )
        return (
            days.join(daily, "pd")
            .groupBy("o_orderkey")
            .agg(
                F.sum("n").cast("bigint").alias("n_shipped"),
                F.sum("q").cast("double").alias("sum_qty"),
            )
            .orderBy("o_orderkey")
        )
    return (
        p.join(
            o,
            (p["bin"] == o["bin"])
            & (F.col("pd") >= F.col("d0"))
            & (F.col("pd") <= F.col("d1")),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_interval_overlap_binned",
    tags=("join", "scale"),
    oracle="""
WITH a AS (
  SELECT o_orderkey AS a_key, CAST(o_orderdate AS DATE) AS a_lo,
         CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS a_hi
  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey <= 6000
),
b AS (
  SELECT o_orderkey AS b_key, CAST(o_orderdate AS DATE) AS b_lo,
         CAST(o_orderdate AS DATE) + INTERVAL 10 DAY AS b_hi
  FROM orders WHERE o_orderpriority = '2-HIGH' AND o_orderkey <= 6000
)
SELECT a.a_key, COUNT(*) AS n_overlaps, MIN(b.b_key) AS first_b
FROM a JOIN b ON a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
GROUP BY a.a_key
ORDER BY a.a_key
""",
)
def join_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (both sides are intervals, no equi-key):
    urgent-order windows [d, d+7] against high-priority windows
    [d, d+10], matched when they overlap. The binned-equi-join scale
    path generalized from join_range_binned_count: each interval
    explodes to its covered bins, the join runs on the bin key with
    the exact overlap predicate as a post-condition, and the
    first-common-bin guard ``bin == max(floor(a_lo), floor(b_lo))``
    keeps exactly ONE copy of each overlapping pair (two overlapping
    intervals always share their later start's bin) — no post-join
    DISTINCT, which at 100 TB would be a second full shuffle of the
    pair stream.

    Scale: duplication factor = interval-span/bin-width + 1 (<= 2-3x
    here), cost bounded by pairs-per-bin density; plan is a
    shuffle-partitionable equi-join, never a nested loop
    (tests/test_plans.py).
    """
    epoch = F.lit("1970-01-01").cast("date")
    bin_w = 16  # > max span (10) so an interval covers <= 2 bins

    def side(prio: str, span: int, key: str, lo: str, hi: str) -> DataFrame:
        d = (
            load(spark, sf_dir, "orders")
            .where((F.col("o_orderpriority") == prio) & (F.col("o_orderkey") <= 6000))
            .select(
                F.col("o_orderkey").alias(key),
                F.to_date("o_orderdate").alias(lo),
                F.date_add(F.to_date("o_orderdate"), span).alias(hi),
            )
        )
        lo_day = F.datediff(F.col(lo), epoch)
        hi_day = F.datediff(F.col(hi), epoch)
        return d.withColumn("lo_day", lo_day).withColumn(
            "bin",
            F.explode(
                F.array_distinct(
                    F.array(F.floor(lo_day / bin_w), F.floor(hi_day / bin_w))
                )
            ),
        )

    a = side("1-URGENT", 7, "a_key", "a_lo", "a_hi").withColumnRenamed("lo_day", "a_lo_day")
    b = side("2-HIGH", 10, "b_key", "b_lo", "b_hi").withColumnRenamed("lo_day", "b_lo_day")
    pairs = a.join(
        b,
        (a["bin"] == b["bin"])
        & (F.col("a_lo") <= F.col("b_hi"))
        & (F.col("b_lo") <= F.col("a_hi"))
        # first-common-bin guard: count each overlapping pair once
        & (
            a["bin"]
            == F.floor(F.greatest(F.col("a_lo_day"), F.col("b_lo_day")) / bin_w)
        ),
    )
    return (
        pairs.groupBy("a_key")
        .agg(F.count(F.lit(1)).alias("n_overlaps"), F.min("b_key").alias("first_b"))
        .orderBy("a_key")
    )


@register(
    "join_null_aware_anti",
    tags=("join", "semantics"),
    oracle="""
WITH probe AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_nationkey END AS nk
  FROM customer WHERE c_custkey <= 500
),
keys AS (
  SELECT DISTINCT CASE WHEN n_nationkey = 11 THEN NULL ELSE n_nationkey END AS k
  FROM nation WHERE n_regionkey <= 1
)
SELECT
  CAST((SELECT COUNT(*) FROM probe WHERE nk NOT IN (SELECT k FROM keys)) AS BIGINT)
    AS n_not_in_with_null,
  CAST((SELECT COUNT(*) FROM probe
        WHERE nk NOT IN (SELECT k FROM keys WHERE k IS NOT NULL)) AS BIGINT)
    AS n_not_in_no_null,
  CAST((SELECT COUNT(*) FROM probe p
        WHERE NOT EXISTS (SELECT 1 FROM keys x WHERE x.k = p.nk)) AS BIGINT)
    AS n_not_exists
""",
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under NULLs — the null-aware anti join, SQL's most
    famous silent-wrong-answer trap, pinned in one row: with a NULL in
    the subquery, ``NOT IN`` is three-valued and returns ZERO rows
    (every comparison is at best UNKNOWN); filtering the NULL out
    restores the intuitive complement; ``NOT EXISTS`` ignores NULLs by
    construction and differs from both when the probe side itself has
    NULL keys. All three counts in one result so the semantic
    distinctions are hash-locked against the oracle. The NULL is
    injected on n_nationkey=11, which survives the n_regionkey <= 1
    filter (11 % 5 = 1), so the key set genuinely contains a NULL and
    ``n_not_in_with_null`` is pinned to 0 — a non-null-aware anti-join
    implementation would return the no-null count and hash-mismatch.

    Scale: Spark plans the null-aware case as BroadcastNestedLoopJoin
    ONLY when the build side may contain NULL (the semantics force
    it); the null-free rewrite and NOT EXISTS get the normal hash anti
    join — i.e. *writing* NOT IN on a nullable column is also a
    performance bug, which is exactly why this query exists in the
    declared surface.
    """
    _v = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    _v.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 100 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    ).createOrReplaceTempView("probe_nulls")
    load(spark, sf_dir, "nation").where(F.col("n_regionkey") <= 1).select(
        F.when(F.col("n_nationkey") == 11, F.lit(None))
        .otherwise(F.col("n_nationkey"))
        .alias("k")
    ).distinct().createOrReplaceTempView("keys_nulls")
    return spark.sql(
        """
        SELECT
          CAST((SELECT COUNT(*) FROM probe_nulls
                WHERE nk NOT IN (SELECT k FROM keys_nulls)) AS BIGINT)
            AS n_not_in_with_null,
          CAST((SELECT COUNT(*) FROM probe_nulls
                WHERE nk NOT IN (SELECT k FROM keys_nulls WHERE k IS NOT NULL)) AS BIGINT)
            AS n_not_in_no_null,
          CAST((SELECT COUNT(*) FROM probe_nulls p
                WHERE NOT EXISTS (SELECT 1 FROM keys_nulls x WHERE x.k = p.nk)) AS BIGINT)
            AS n_not_exists
        """
    )


_HINTS = ("broadcast", "merge", "shuffle_hash")


@register(
    "join_strategy_hints",
    tags=("join", "scale", "optimizer"),
    oracle="""
WITH agg AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_quantity < 5
  GROUP BY o_orderpriority
)
SELECT strategy, o_orderpriority, n, revenue
FROM agg CROSS JOIN (VALUES ('broadcast'), ('merge'), ('shuffle_hash')) s(strategy)
ORDER BY strategy, o_orderpriority
""",
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join strategy hints (BROADCAST / MERGE / SHUFFLE_HASH): the
    SAME logical join executed under all three hinted physical
    strategies, each variant's aggregate emitted under its strategy
    label — so the hash check pins that the physical strategy NEVER
    changes the result (the optimizer-override safety contract), and
    tests/test_plans.py asserts each hint actually selected its
    operator (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin).

    Scale: hints are the manual override when the planner's size
    estimates are wrong — a broadcast that spills (hint MERGE), a
    known-small dim under an inflated estimate (hint BROADCAST), a
    high-cardinality equi-join with cheap build side (SHUFFLE_HASH
    skips the sort). AQE re-plans most of this at runtime; the hint
    surface is the escape hatch that must stay result-neutral.
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 5).select(
        "l_orderkey", "l_extendedprice"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    out = None
    for h in _HINTS:
        j = li.join(o.hint(h), li.l_orderkey == o.o_orderkey)
        agg = (
            j.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .select(F.lit(h).alias("strategy"), "o_orderpriority", "n", "revenue")
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("strategy", "o_orderpriority")


# --------------------------------------------- grid-bucketed spatial join

# Geospatial nearest-neighbor join distilled to its scale pattern:
# bucket both point sets into an adaptive GxG grid, equi-join each
# probe point's 3x3 cell neighborhood against the build side, take the
# per-probe argmin. Points here are deterministic hash geocodes of the
# entity keys in INTEGER micro-units on the unit square (the container
# has no geo data; the plumbing — grid key, neighborhood explode,
# equi-join, argmin — is exactly what real lat/lon would use, with
# geohash cells for the sphere).
GEO_UNIT = 1_000_000  # micro-unit coordinate space [0, 1e6)^2
GEO_SEED_CX, GEO_SEED_CY = 101, 102  # customer x/y hash seeds
GEO_SEED_SX, GEO_SEED_SY = 201, 202  # supplier x/y hash seeds


def _grid_g(n_build: int) -> int:
    """G = clamp(floor(sqrt(n)), 8, 1024): ~1 build point per cell, so
    a 3x3 probe neighborhood holds ~9 candidates at ANY corpus size."""
    import math

    return max(8, min(1024, int(math.floor(math.sqrt(float(n_build))))))


_SQL_GRID_G = (
    "GREATEST(8, LEAST(1024, CAST(FLOOR(SQRT(CAST((SELECT COUNT(*) FROM customer)"
    " AS DOUBLE))) AS BIGINT)))"
)


@register(
    "join_spatial_grid_knn",
    tags=("join", "spatial"),
    oracle=f"""
WITH gv AS (SELECT {_SQL_GRID_G} AS g),
cpt AS (
  SELECT c_custkey,
         {sql_hash60("CAST(c_custkey AS VARCHAR)", seed=GEO_SEED_CX)} % {GEO_UNIT} AS x,
         {sql_hash60("CAST(c_custkey AS VARCHAR)", seed=GEO_SEED_CY)} % {GEO_UNIT} AS y
  FROM customer
),
spt AS (
  SELECT s_suppkey,
         {sql_hash60("CAST(s_suppkey AS VARCHAR)", seed=GEO_SEED_SX)} % {GEO_UNIT} AS x,
         {sql_hash60("CAST(s_suppkey AS VARCHAR)", seed=GEO_SEED_SY)} % {GEO_UNIT} AS y
  FROM supplier
),
cc AS (SELECT c_custkey, x, y,
              (x * (SELECT g FROM gv)) // {GEO_UNIT} AS cx,
              (y * (SELECT g FROM gv)) // {GEO_UNIT} AS cy FROM cpt),
sc AS (
  SELECT DISTINCT s_suppkey, s.x, s.y,
         GREATEST(0, LEAST((SELECT g FROM gv) - 1,
                           (s.x * (SELECT g FROM gv)) // {GEO_UNIT} + d.dx)) AS cx,
         GREATEST(0, LEAST((SELECT g FROM gv) - 1,
                           (s.y * (SELECT g FROM gv)) // {GEO_UNIT} + d.dy)) AS cy
  FROM spt s CROSS JOIN (SELECT a.dx, b.dy
                         FROM (VALUES (-1),(0),(1)) a(dx),
                              (VALUES (-1),(0),(1)) b(dy)) d
),
cand AS (
  SELECT s.s_suppkey, c.c_custkey,
         (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y) AS dist2
  FROM sc s JOIN cc c ON s.cx = c.cx AND s.cy = c.cy
),
best AS (
  SELECT s_suppkey, c_custkey, dist2,
         ROW_NUMBER() OVER (PARTITION BY s_suppkey ORDER BY dist2, c_custkey) AS rk
  FROM cand
)
SELECT s_suppkey, c_custkey AS nearest_custkey, CAST(dist2 AS BIGINT) AS dist2_micro
FROM best WHERE rk = 1 ORDER BY s_suppkey
""",
)
def join_spatial_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest customer to each supplier within its 3×3 grid
    neighborhood — the grid-bucketed spatial join (the partitioning
    trick behind every distributed geo engine: Sedona's uniform grid,
    geohash prefix joins). Every coordinate and distance is an exact
    integer, so the argmin is bit-deterministic cross-engine with no
    FP geometry anywhere.

    Semantics: candidates are the build points in the probe's 3×3 cell
    neighborhood (radius ≥ one cell width). G ≈ √n_build keeps ~1
    build point per cell, so candidate count stays ~9 at ANY scale; a
    probe with an empty neighborhood yields no row (e^-9 of probes at
    uniform density).

    Scale: the neighborhood explode is a constant 9× on the PROBE side
    only; the join is a plain equi-join on the cell key (shuffle
    partitions by cell, AQE may broadcast the smaller side), and the
    argmin is a per-probe window over ≤ ~9·density rows. No
    cross-join, no distance computed outside matching cells.
    """
    from spark_rapids_ml_spark.functions.portable import hash60

    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    g = _grid_g(cust.count())
    ckey = F.col("c_custkey").cast("string")
    skey = F.col("s_suppkey").cast("string")
    cc = cust.select(
        "c_custkey",
        (hash60(ckey, seed=GEO_SEED_CX) % GEO_UNIT).alias("x"),
        (hash60(ckey, seed=GEO_SEED_CY) % GEO_UNIT).alias("y"),
    ).select(
        "c_custkey",
        "x",
        "y",
        F.expr(f"(x * {g}) div {GEO_UNIT}").alias("cx"),
        F.expr(f"(y * {g}) div {GEO_UNIT}").alias("cy"),
    )
    sc = (
        supp.select(
            "s_suppkey",
            (hash60(skey, seed=GEO_SEED_SX) % GEO_UNIT).alias("x"),
            (hash60(skey, seed=GEO_SEED_SY) % GEO_UNIT).alias("y"),
        )
        .select(
            "s_suppkey",
            "x",
            "y",
            F.explode(F.expr("array(-1, 0, 1)")).alias("dx"),
        )
        .select("s_suppkey", "x", "y", "dx", F.explode(F.expr("array(-1, 0, 1)")).alias("dy"))
        .select(
            "s_suppkey",
            "x",
            "y",
            F.greatest(
                F.lit(0),
                F.least(F.lit(g - 1), F.expr(f"(x * {g}) div {GEO_UNIT}") + F.col("dx")),
            ).alias("cx"),
            F.greatest(
                F.lit(0),
                F.least(F.lit(g - 1), F.expr(f"(y * {g}) div {GEO_UNIT}") + F.col("dy")),
            ).alias("cy"),
        )
        .distinct()
    )
    cand = sc.alias("s").join(
        cc.alias("c"),
        (F.col("s.cx") == F.col("c.cx")) & (F.col("s.cy") == F.col("c.cy")),
    )
    dist2 = (F.col("s.x") - F.col("c.x")) * (F.col("s.x") - F.col("c.x")) + (
        F.col("s.y") - F.col("c.y")
    ) * (F.col("s.y") - F.col("c.y"))
    from pyspark.sql import Window

    wr = Window.partitionBy("s_suppkey").orderBy("dist2", "c_custkey")
    return (
        cand.select("s_suppkey", "c_custkey", dist2.alias("dist2"))
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select(
            "s_suppkey",
            F.col("c_custkey").alias("nearest_custkey"),
            F.col("dist2").cast("bigint").alias("dist2_micro"),
        )
        .orderBy("s_suppkey")
    )

"""Window-function surface: ranking, lag/lead, running aggregates,
row/range frames, first/last, top-k per group.

Scale notes (100 TB): a window = one shuffle on partitionBy keys +
per-partition sort. All queries here partition on mid-cardinality
keys (custkey, mktsegment) so no single partition exceeds executor
memory; skewed partition keys would need pre-aggregation or AQE skew
handling. Every ORDER BY inside a window ends with a unique tiebreak
column — rank functions are only deterministic with total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "window_rank_family",
    tags=("window",),
    oracle="""
SELECT c_custkey, c_mktsegment,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM customer
WHERE c_custkey <= 600
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_custkey
""",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number over a global ORDER BY (dimension-table-sized input by design — a global window is a single-partition sort at scale)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 600)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    ).orderBy("c_custkey")


@register(
    "window_distribution_ranks",
    tags=("window",),
    oracle="""
SELECT s_suppkey,
       -- percent_rank/cume_dist are exact int ratios: unrounded
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       CAST(NTILE(10) OVER w AS BIGINT) AS decile
FROM supplier
WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
ORDER BY s_suppkey
""",
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile — distribution-position
    functions (unique total order so every rank is deterministic).

    Scale: global distribution ranks are inherently a total-order
    window (single reducer) — declared over the bounded supplier dim
    only; fact-scale quantile positions use approx_percentile or a
    partitioned rank instead."""
    s = load(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    ).orderBy("s_suppkey")


@register(
    "window_lag_lead",
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS price,
       CAST(LAG(o_totalprice) OVER w AS DOUBLE) AS prev_price,
       CAST(LEAD(o_totalprice, 1, -1.0) OVER w AS DOUBLE) AS next_price,
       CAST(o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS DOUBLE) AS delta
FROM orders
WHERE o_custkey <= 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation within user-partitioned event streams."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    p = F.col("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        p.cast("double").alias("price"),
        F.lag(p).over(w).cast("double").alias("prev_price"),
        F.lead(p, 1, -1.0).over(w).cast("double").alias("next_price"),
        (p - F.coalesce(F.lag(p).over(w), p)).cast("double").alias("delta"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_running_sum",
    tags=("window",),
    bench=True,
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       CAST(MIN(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_min,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
FROM orders
WHERE o_custkey <= 300
ORDER BY o_custkey, o_orderkey
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per partition — the prefix-scan window."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") <= 300)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
        F.min("o_totalprice").over(w).cast("double").alias("running_min"),
        F.count(F.lit(1)).over(w).alias("running_cnt"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_range_frame",
    tags=("window",),
    oracle="""
SELECT s_suppkey,
       CAST(s_acctbal AS DOUBLE) AS bal,
       COUNT(*) OVER (ORDER BY s_acctbal RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_500,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (
         ORDER BY s_acctbal RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS DOUBLE) AS band_sum
FROM supplier
ORDER BY s_suppkey
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween over a numeric ordering (value-based frame).

    Scale: a global (unpartitioned) window is a single-reducer sort —
    fine for a bounded dimension like supplier, never for a fact
    table; fact-scale range frames should partition first.
    """
    s = load(spark, sf_dir, "supplier")
    w1 = Window.orderBy("s_acctbal").rangeBetween(-500, Window.currentRow)
    w2 = Window.orderBy("s_acctbal").rangeBetween(-500, 500)
    return s.select(
        "s_suppkey",
        F.col("s_acctbal").cast("double").alias("bal"),
        F.count(F.lit(1)).over(w1).alias("n_within_500"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).over(w2).cast("double").alias("band_sum"),
    ).orderBy("s_suppkey")


@register(
    "window_first_last",
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_ok,
       LAST_VALUE(o_orderkey) OVER w AS last_ok,
       CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price
FROM orders
WHERE o_custkey <= 150
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over explicit frames."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") <= 150)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_topk_per_group",
    tags=("window",),
    bench=True,
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_custkey, c_name,
         CAST(c_acctbal AS DOUBLE) AS bal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_mktsegment, c_custkey, c_name, bal, rn
FROM ranked WHERE rn <= 5
ORDER BY c_mktsegment, rn
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the canonical window+filter pattern.

    Scale: Catalyst pushes the rn<=k filter into the window sort as a
    group-limit (WindowGroupLimit), so each partition keeps only k
    rows before shuffle — this stays cheap at any scale.
    """
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("bal"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


# Session gap threshold: a new session starts after > 6 idle hours.
_SESSION_GAP_SECONDS = 21600


@register(
    "window_sessionize_gaps",
    tags=("window", "timeseries"),
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev IS NULL
                OR datediff('second', prev, ts) > 21600 THEN 1 ELSE 0 END AS is_new
  FROM e
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
), g AS (
  SELECT user_id, sid, COUNT(*) AS n_ev,
         datediff('second', MIN(ts), MAX(ts)) AS dur
  FROM s GROUP BY user_id, sid
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
       CAST(SUM(dur) AS BIGINT) AS total_active_seconds
FROM g GROUP BY user_id ORDER BY user_id
""",
)
def window_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into
    sessions at > 6-hour idle gaps (lag -> new-session flag -> running
    sum as session id), then roll up per-user session stats.

    Scale: the classic gap-and-island pattern — one shuffle on
    user_id for the windows (lag and running sum share the same
    sort), a (user, sid) partial-aggregated rollup, then the tiny
    per-user merge. Linear in events, no self-join; the per-user
    state is one sort run, which AQE can skew-split if one user
    dominates. Second-boundary gap arithmetic (unix_timestamp
    difference == DuckDB datediff('second')) keeps the engines
    bit-identical.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > _SESSION_GAP_SECONDS), F.lit(1)).otherwise(F.lit(0)),
    )
    sid = flagged.withColumn(
        "sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    sessions = sid.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("dur"),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").cast("bigint").alias("n_events"),
            F.max("n_ev").cast("bigint").alias("max_session_events"),
            F.sum("dur").cast("bigint").alias("total_active_seconds"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------- robust statistics

MAD_USER_CAP = 150  # bounded output slice (users are hash-uniform)


@register(
    "window_median_mad_robust",
    tags=("window", "stats"),
    oracle=f"""
WITH v AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE user_id <= {MAD_USER_CAP}
),
rk AS (
  SELECT user_id, cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cents, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM v
),
med AS (SELECT user_id, MAX(n) AS n,
               MAX(CASE WHEN i = (n + 1) // 2 THEN cents END) AS median_cents
        FROM rk GROUP BY user_id),
dev AS (
  SELECT v.user_id, v.event_id, abs(v.cents - m.median_cents) AS d
  FROM v JOIN med m USING (user_id)
),
drk AS (
  SELECT user_id, d,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM dev
),
mad AS (SELECT user_id, MAX(CASE WHEN i = (n + 1) // 2 THEN d END) AS mad_cents
        FROM drk GROUP BY user_id)
SELECT m.user_id, CAST(m.n AS BIGINT) AS n,
       CAST(m.median_cents AS BIGINT) AS median_cents,
       CAST(a.mad_cents AS BIGINT) AS mad_cents
FROM med m JOIN mad a USING (user_id)
ORDER BY m.user_id
""",
)
def window_median_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust center + spread: the LOWER MEDIAN (element at
    rank (n+1)//2 under a total order — no interpolation, so no FP)
    and the median absolute deviation around it, both in exact integer
    cents. MAD is the robust alternative to the z-score stack
    (events_rolling_zscore_anomaly): one outlier payment shifts a
    stddev arbitrarily but moves MAD by at most one rank step —
    anomaly gates on MAD survive the heavy-tailed spend distributions
    that break Gaussian gates.

    The rank-select formulation (row_number = (n+1)//2) is what makes
    an exact median portable: both engines' native median() functions
    interpolate even-count groups in engine-specific float arithmetic.

    Scale: two windows and one join, ALL partitioned by user_id — one
    logical co-partitioning, so the exchange happens once and the
    median/deviation/MAD stages run partition-local. The user cap
    bounds the declared output; the plan is per-key linear in events.
    """
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    v = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") <= MAD_USER_CAP)
        .select("user_id", "event_id", cents.alias("cents"))
    )
    wr = Window.partitionBy("user_id").orderBy("cents", "event_id")
    wn = Window.partitionBy("user_id")
    rk = v.select(
        "user_id",
        "cents",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # integer (n+1)//2 via div — matches the oracle's rank arithmetic
    med = rk.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.expr("i = (n + 1) div 2"), F.col("cents"))
        ).alias("median_cents"),
    )
    dev = v.join(med.select("user_id", "median_cents"), "user_id").select(
        "user_id",
        "event_id",
        F.abs(F.col("cents") - F.col("median_cents")).alias("d"),
    )
    wd = Window.partitionBy("user_id").orderBy("d", "event_id")
    drk = dev.select(
        "user_id",
        "d",
        F.row_number().over(wd).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = drk.groupBy("user_id").agg(
        F.max(F.when(F.expr("i = (n + 1) div 2"), F.col("d"))).alias("mad_cents")
    )
    return (
        med.join(mad, "user_id")
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n"),
            F.col("median_cents").cast("bigint").alias("median_cents"),
            F.col("mad_cents").cast("bigint").alias("mad_cents"),
        )
        .orderBy("user_id")
    )

"""Time-series operators Spark lacks as builtins, composed from
DataFrame primitives: as-of join and multi-granularity rollup.

The as-of join (match each event to the most recent preceding order of
the same user) is THE time-series join; Spark has no native operator,
so it is built with the union-tag + last_value(ignorenulls) window
pattern — one shuffle+sort per key, no range explosion. DuckDB's
native ASOF JOIN is the oracle, which checks the composition exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "asof_join_latest_order",
    tags=("timeseries", "join"),
    bench=True,
    oracle="""
WITH o AS (
  -- unique (user, time) keys so the as-of match is well-defined
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey,
       CAST(datediff('second', o.o_orderdate, e.ts) AS BIGINT) AS lag_seconds
FROM (SELECT event_id, user_id, ts FROM events WHERE event_id <= 2000) e
ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY event_id
""",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matches the latest order with
    o_orderdate <= ts for the same user (inner as-of: events with no
    preceding order drop out).

    Spark plan: tag+union both sides, one window sorted by
    (user, t, tag) carrying last non-null order key forward — a single
    shuffle on user, linear in rows, no interval cross-product. This
    is the scalable distributed as-of; DuckDB's native ASOF JOIN
    verifies the composition.
    """
    e = load(spark, sf_dir, "events").where(F.col("event_id") <= 2000)
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    o_side = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),  # orders sort BEFORE events at equal t (>= is inclusive)
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e_side = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("okey"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry BOTH the order key and its timestamp through the window —
    # no join-back needed (one shuffle total)
    merged = (
        o_side.unionByName(e_side)
        .withColumn("matched_okey", F.last("okey", ignorenulls=True).over(w))
        .withColumn(
            "otime",
            F.last(F.when(F.col("tag") == 0, F.col("t")), ignorenulls=True).over(w),
        )
    )
    matched = merged.where(F.col("event_id").isNotNull() & F.col("matched_okey").isNotNull())
    return matched.select(
        "event_id",
        "user_id",
        F.col("matched_okey").alias("o_orderkey"),
        (F.unix_timestamp("t") - F.unix_timestamp("otime")).cast("bigint").alias("lag_seconds"),
    ).orderBy("event_id")


@register(
    "timeseries_multi_rollup",
    tags=("timeseries", "agg"),
    oracle="""
SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), '<all>') AS day,
       COALESCE(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'), '<all>') AS hour,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
ORDER BY day, hour
""",
)
def timeseries_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: one pass produces
    hourly, daily, and grand-total rollups of the event stream
    (GROUP BY ROLLUP over truncated time) — the batch equivalent of a
    downsampling cascade."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    return (
        e.rollup(day.alias("d"), hour.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce(F.date_format("d", "yyyy-MM-dd"), F.lit("<all>")).alias("day"),
            F.coalesce(F.date_format("h", "yyyy-MM-dd HH:mm:ss"), F.lit("<all>")).alias("hour"),
            "n",
            "total_value",
        )
        .orderBy("day", "hour")
    )

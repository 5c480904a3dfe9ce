"""Iterative graph analytics on DataFrames: PageRank over the
customer-supplier bipartite graph implied by orders x lineitem.

Companion to the connected-components operator in dedup.py: together
they cover the two canonical message-passing shapes (label min /
weighted contribution sum). The rank state is FIXED-POINT INTEGER
(nano-units), not float: a parallel float reduction's result depends
on combine order, so a float PageRank is not even self-deterministic
across partitionings, let alone cross-engine. Integer contributions
(`rank div degree`) and integer damping make every iteration bit-exact
on any topology AND identical in the DuckDB oracle, which unrolls the
same five iterations as SQL CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load

_ITERS = 5
_ONE = 1_000_000_000  # 1.0 rank in nano-units
_TELEPORT = 150_000_000  # 0.15
_DAMP_NUM, _DAMP_DEN = 850, 1000  # 0.85 as a ratio
_SUPPLIER_BASE = 1_000_000  # node-id offset for the supplier side


def _pagerank_oracle() -> str:
    its = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        its.append(
            f"""it{i} AS (
  SELECT ed.dst AS id,
         -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT; bring the rank
         -- back to BIGINT so the output schema matches Spark's
         CAST({_TELEPORT} + ({_DAMP_NUM} * SUM({prev}.r // ed.d)) // {_DAMP_DEN} AS BIGINT) AS r
  FROM ed JOIN {prev} ON {prev}.id = ed.src
  GROUP BY ed.dst
)"""
        )
        prev = f"it{i}"
    chain = ",\n".join(its)
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPPLIER_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_orderkey <= 6000
),
sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
ed AS (SELECT s.src, s.dst, deg.d FROM sym s JOIN deg ON deg.src = s.src),
r0 AS (SELECT src AS id, CAST({_ONE} AS BIGINT) AS r FROM deg),
{chain}
SELECT id, r AS rank_nano FROM it{_ITERS}
ORDER BY rank_nano DESC, id
LIMIT 20
"""


@register("graph_pagerank_bipartite", tags=("graph", "scale"), oracle=_pagerank_oracle())
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five fixed PageRank iterations (damping 0.85, teleport per
    node) on the symmetric customer-supplier graph; top-20 nodes by
    final rank, in exact nano-unit integers.

    Scale: each iteration is ONE shuffle — messages equi-join ranks on
    src (rank state is deg-sized, AQE broadcasts it when small) and
    aggregate on dst with map-side partial sums. The edge list with
    degrees is reused across iterations (at 100 TB: cache/checkpoint
    it and checkpoint ranks every few iterations to cut lineage — the
    same discipline as dedup.py's label propagation, which shares this
    message-passing shape). O(iterations) jobs, O(E) work each,
    bounded state; the fixed-point arithmetic makes the result
    independent of partition count and combine order (asserted in
    tests/test_graph.py by re-running under a different
    parallelism).
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 6000)
        .select("l_orderkey", "l_suppkey")
    )
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(_SUPPLIER_BASE) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    sym = e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = sym.join(deg, "src")
    ranks = deg.select(F.col("src").alias("id"), F.lit(_ONE).cast("bigint").alias("r"))
    for _ in range(_ITERS):
        msgs = ed.join(ranks, ed.src == ranks.id).select(
            "dst", F.expr("r div d").alias("c")
        )
        ranks = msgs.groupBy(F.col("dst").alias("id")).agg(
            (
                F.lit(_TELEPORT)
                + F.expr(f"({_DAMP_NUM} * sum(c)) div {_DAMP_DEN}")
            ).alias("r")
        )
    return (
        ranks.select("id", F.col("r").alias("rank_nano"))
        .orderBy(F.col("rank_nano").desc(), "id")
        .limit(20)
    )

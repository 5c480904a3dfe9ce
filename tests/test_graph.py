"""PageRank invariants: fixed-point determinism and convergence
sanity. The DuckDB hash oracle already pins exact values; these tests
pin the properties that make the operator safe at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pagerank_partition_invariance(spark):
    """Integer fixed-point arithmetic must make the result independent
    of shuffle width / combine order (a float PageRank would differ in
    late digits between these two runs)."""
    from spark_rapids_ml_spark.operators.graph import graph_pagerank_bipartite

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")
        a = [tuple(r) for r in graph_pagerank_bipartite(spark, SF).collect()]
        spark.conf.set(key, "17")
        b = [tuple(r) for r in graph_pagerank_bipartite(spark, SF).collect()]
    finally:
        spark.conf.set(key, prev)
    assert a == b


def test_pagerank_mass_and_ordering(spark):
    """Ranks stay near the teleport+damping fixed point's plausible
    range (every node has in-edges here, so r >= teleport) and the
    top node must be a supplier (suppliers aggregate many customers
    in the bipartite graph)."""
    from spark_rapids_ml_spark.operators.graph import (
        _SUPPLIER_BASE,
        _TELEPORT,
        graph_pagerank_bipartite,
    )

    rows = graph_pagerank_bipartite(spark, SF).collect()
    assert len(rows) == 20
    assert all(r["rank_nano"] >= _TELEPORT for r in rows)
    assert rows[0]["id"] >= _SUPPLIER_BASE
    ranks = [r["rank_nano"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)

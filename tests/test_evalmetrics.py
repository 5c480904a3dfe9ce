"""Semantic pins for the evaluation-metric operators beyond the hash
oracle: the exact-sum regression agrees with Spark's native regr_*
family, the rank-AUC matches a direct pairwise computation, and the
confusion counts satisfy their marginal identities."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from spark_rapids_ml_spark.operators import evalmetrics as ev
from spark_rapids_ml_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def test_regr_exact_sums_match_native_regr_family(spark):
    """The integer-power-sum slope/intercept/r2 must agree with
    Spark's native streaming regr_slope/regr_intercept/regr_r2 to
    1e-9 relative — same statistic, different accumulation."""
    ours = {r.l_linestatus: r for r in ev.ml_regr_diagnostics(spark, SF).collect()}
    li = load(spark, SF, "lineitem").where(F.col("l_orderkey") <= ev.REGR_KEY_CAP)
    native = {
        r.l_linestatus: r
        for r in li.select(
            "l_linestatus",
            F.col("l_quantity").cast("bigint").cast("double").alias("x"),
            F.round(F.col("l_extendedprice"), 0).alias("y"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("intercept"),
            F.regr_r2("y", "x").alias("r2"),
        )
        .collect()
    }
    assert set(ours) == set(native)
    for k in ours:
        for fld in ("slope", "intercept", "r2"):
            a, b = getattr(ours[k], fld), getattr(native[k], fld)
            assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (k, fld, a, b)


def test_auc_rank_matches_pairwise_definition(spark):
    """Mann-Whitney rank AUC == P(score_pos > score_neg) computed by
    brute-force pair enumeration on the tie-broken score key."""
    rows = ev.ml_eval_auc_rank(spark, SF).collect()
    o = load(spark, SF, "orders")
    c = load(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    scored = (
        o.join(c, "o_custkey")
        .select(
            "segment",
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)
            .alias("label"),
            (
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint") * F.lit(1000000000)
                + F.col("o_orderkey")
            ).alias("score_key"),
        )
        .collect()
    )
    by_seg: dict[str, tuple[list[int], list[int]]] = {}
    for r in scored:
        pos, neg = by_seg.setdefault(r.segment, ([], []))
        (pos if r.label == 1 else neg).append(r.score_key)
    for row in rows:
        pos, neg = by_seg[row.segment]
        assert row.n_pos == len(pos) and row.n_neg == len(neg)
        wins = sum(1 for p, n in itertools.product(pos, neg) if p > n)
        assert abs(row.auc - wins / (len(pos) * len(neg))) < 1e-12


def test_confusion_marginals_consistent(spark):
    """tp+fn per class sums to the class's doc count; Σtp+Σfp = Σtp+Σfn
    = total docs classified (every doc gets exactly one prediction)."""
    rows = ev.ml_eval_confusion_prf(spark, SF).collect()
    n_docs_by_lang = {
        r.lang: r.n
        for r in load(spark, SF, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(n_docs_by_lang.values())
    assert sum(r.tp + r.fn for r in rows) == total
    assert sum(r.tp + r.fp for r in rows) == total
    for r in rows:
        assert r.tp + r.fn == n_docs_by_lang[r.lang]
        assert 0.0 <= r.rec <= 1.0 and 0.0 <= r.f1 <= 1.0

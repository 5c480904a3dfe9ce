"""Partitioning-invariance: declared results must not depend on data
layout — the property that makes them correct on a 1000-executor
cluster where partitioning is whatever the scheduler produces.

Each sampled query runs under a different shuffle-partition setting
and must produce byte-identical normalized output. (Exact decimal
aggregation, commutative merges, and total ordering are what make
this hold; a float-sum formulation would fail here.)
"""

from __future__ import annotations

import pytest

from spark_rapids_ml_spark.harness import _normalize
from spark_rapids_ml_spark.registry import all_queries

SF = "/root/testdata/sf0.001"

SAMPLED = [
    "q1_pricing_summary",
    "agg_moments_exact",
    "dedup_minhash_signatures",
    "asof_join_latest_order",
    "window_topk_per_group",
    "pca_covariance_matrix",
    "udf_grouped_agg_weighted_avg",
    # dataset assembly: packing depends on a TOTAL order prefix sum,
    # cosine tiles on applyInPandas grouping — both must be
    # layout-independent; splits/samples are row-local by construction
    "pipe_sequence_packing",
    "pipe_deterministic_split",
    "pipe_contamination_overlap",
    "dedup_embedding_cosine_pairs",
    # round 6: windowed/joined ops whose tie-broken orderings and
    # mergeable state must hold under any layout
    "join_asof_nearest_tolerance",
    "events_transition_matrix",
    "window_trailing_distinct_users",
    "ml_ridge_closed_form",
    "mm_tensor_export_batches",
    "pipe_end_to_end_curation",
    # round-6 second session: sketch merges (KMV k-min, CMS cells),
    # frontier BFS, ADC integer sums, CDC diff — all must be
    # layout-independent by construction (integer/exact-decimal state)
    "agg_kmv_theta_sketch_ops",
    "agg_count_min_sketch",
    "graph_bfs_shortest_path",
    "sim_pq_adc_topk",
    "sink_change_data_feed",
    "feature_hashing_trick",
    # round 7: rank-statistic AUC (window rank + integer reduction),
    # EWMA (in-frame bigint weighted sum), Bloom (bit_or merge),
    # k-core (per-round semi-joins), collocation lift (three
    # partial-aggregable counts + deterministic double sort)
    "ml_eval_auc_rank",
    "timeseries_ewma_halflife",
    "agg_bloom_filter_membership",
    "graph_kcore_peeling",
    "text_collocation_lift",
    # round 7b: the fixed-point IRLS trajectory (nano sums), the KM
    # fold (packed-array prefix product), the sweep line (tie groups
    # carry identical deltas), Gini (rank-weighted decimal sums),
    # histogram split (two-phase integer agg), LPA (deterministic
    # tie-broken supersteps)
    "ml_logreg_irls_newton",
    "events_survival_kaplan_meier",
    "events_peak_concurrency",
    "agg_gini_revenue_concentration",
    "ml_tree_split_histogram",
    "graph_label_propagation",
    # round 8: the three de-single-tasked order statistics (distributed
    # scan NTILE/cumsum, functions/scan.py) and the pre-pruned vocab
    # ranking — exactly the refactors whose correctness depends on
    # layout-independence of the range-partition + offset composition
    "events_rfm_segmentation",
    "pipe_token_budget_selection",
    "text_vocab_coverage_curve",
    "agg_exact_quantiles_scan",
    "agg_weighted_quantiles_scan",
    "graph_degree_distribution_ccdf",
    "agg_pareto_share_scan",
    "events_weekday_seasonality",
    "events_uplift_by_segment",
    "dq_psi_distribution_drift",
    "agg_hhi_concentration",
    "pipe_curate_budget_pack",
    "pca_covariance_incremental_merge",
    # round 9: the new distributed-scan consumers (Zipf rank, KS and
    # MWU double-ECDF/pooled-rank cumsums, serpentine shard rank,
    # curriculum NTILE), the cluster-then-pairwise SemDeDup (kmeans
    # partials + per-cluster GEMM groups), HITS (nano-int
    # normalization), and the AQE skew split (a physical-only rewrite)
    "text_zipf_law_fit",
    "agg_ks_two_sample",
    "agg_mann_whitney_u",
    "pipe_shard_bin_packing",
    "pipe_curriculum_stages",
    "dedup_semantic_clusters",
    "graph_hits_hubs_authorities",
    "scale_aqe_skew_join_split",
    "agg_spearman_rank_corr",
    "text_rake_keywords",
    "events_funnel_time_to_convert",
    # round 11: the composed IVF tiers (learned cells + int8 codec /
    # streaming partitioned ingest — assignment is a pure per-row map
    # of frozen centroids, scores 6dp-rounded before any tie-break),
    # the learned-cell PSI histogram (integer counts + fixed-order
    # ln), and the all-bigint Hamilton apportionment
    "sim_ivf_sq_hybrid_topk",
    "stream_ivf_index_ingest",
    "dq_embedding_drift_psi",
    "pipe_mixture_budget_apportionment",
    # round 12: the drift-gated retrain lifecycle (gate scalar is an
    # exact-integer sum of 6dp-guarded terms; both trainings are the
    # layout-independent kmeans; ingest assignment a pure per-row
    # map) and the Arrow-batched SQ coarse scan (per-partition local
    # top-k is a SUBSET-preserving prune — the global window sees a
    # superset of the global top-QUANT_CAND under ANY layout)
    "stream_ann_drift_retrain_lifecycle",
    "sim_quantized_topk",
    # round 13: the filtered probe (selectivity counts are exact
    # bigints; the widened probe set and the pushed predicate are
    # layout-free; scoring is the 6dp-rounded dot with id tie-break),
    # the append tick (manifest branch decided by the same exact gate
    # scalar; the unioned dirs' content is set-equal under any
    # micro-batch layout), and RRF (integer idf dots, integer
    # floor-div fusion — no float rank key anywhere)
    "sim_filtered_ivf_topk",
    "stream_ann_incremental_append",
    "retrieval_rrf_fusion",
    # the compaction tick: the surviving-row set is a layout-free
    # anti-join of exact id sets; the compacted dir's CONTENT (not
    # file layout) feeds the probe, whose ranking is the 6dp dot with
    # id tie-break; the count columns are exact bigints
    "stream_ann_compaction_tick",
    # filtered RRF: both towers' ranks are deterministic keys
    # (integer idf dots / 6dp cosine with id tie-break) over
    # layout-free candidate sets (collection-stat posting join; the
    # widened probe's exact-integer cell set); fusion is integer
    # floor-division
    "retrieval_rrf_filtered_fusion",
    # rollback probe: the pointer re-point is filesystem metadata;
    # the served view's CONTENT and the probe ranking are the same
    # layout-free machinery as every IVF tier
    "stream_ann_rollback_probe",
    # MMR: candidate sets are exact-integer rank cuts; the greedy
    # loop runs on ONE complete per-query group (applyInPandas
    # repartitions by qid regardless of input layout) with integer
    # scores and id tie-breaks
    "retrieval_mmr_diversified",
]


@pytest.mark.parametrize("name", SAMPLED)
def test_result_invariant_to_shuffle_partitions(spark, name):
    spec = all_queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _normalize(spec.fn(spark, SF).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        b = _normalize(spec.fn(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a.equals(b), f"{name} result depends on partitioning"

"""Declared-query registry: the engine's correctness contract.

Every operator the engine claims (SURVEY.md §2.B) registers here as a
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus —
whenever SQL-expressible — an equivalent ANSI-SQL string a DuckDB
oracle can run on the same parquet tables. ``__spark_entry__.py``
simply re-exports this registry to the driver.

Determinism contract (FIXTURES.md): total ORDER BY on a unique key,
doubles rounded via round(x, 6) (exact-decimal formulations where
cross-engine FP drift could exceed 1e-6), output columns restricted
to string / bigint / double, identical aliases on both sides.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclasses.dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None -> rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: declare a named query with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


# External correctness sweeps are budget-bound (50 queries/round) and
# enumerate ``queries()`` in order, so the enumeration order is rotated
# each round to give every declared operator a driver-visible verdict.
# Round 4 checked the 42 never-checked-through-r03 queries plus the
# multimodal oracles and round-4 additions (CORRECTNESS_r04.json).
# Round 5 front-loads: (a) queries new, fixed, or refactored this
# round, (b) the late-round-4 additions that have never had a driver
# row, (c) the queries whose newest driver row is oldest (the r01/r02
# aggregate/array/dedup/join prefix) — filling the 50-query window.
# Names absent from the registry are skipped, so the list is safe
# across partial loads.
SWEEP_PRIORITY: list[str] = [
    # -- round 11 rotation head: (a) queries round 11 ADDED or
    # CHANGED — the new IVF-SQ hybrid (composes the int8 codec with
    # the learned coarse quantizer) and the flat quantized tier whose
    # reconstruction now routes through the shared _sq_reconstructed
    # helper (values unchanged; the fresh driver row proves it). The
    # rest of the window follows tools/staleness.py least-recently-
    # sampled order (STALENESS.md is the auditable artifact).
    "sim_ivf_sq_hybrid_topk",
    "sim_quantized_topk",
    # round-11 additions: streaming ANN index ingest (bootstrap-train
    # + exactly-once partitioned file-sink append) and the mixture
    # budget apportionment (largest-remainder integer allocation)
    "stream_ivf_index_ingest",
    "pipe_mixture_budget_apportionment",
    "dq_embedding_drift_psi",
    # lineage-cut rewrites (hashes pinned unchanged at three decades
    # this round; the fresh driver row re-proves it on the new code)
    "graph_bfs_shortest_path",
    "graph_label_propagation",
    "graph_community_modularity",
    "graph_hits_hubs_authorities",
    # -- round 11 window tail: the 44 least-recently-sampled queries
    # (tools/staleness.py order; STALENESS.md is the audit artifact) —
    # all 23 r03-era survivors plus the oldest 21 of the r04 cohort.
    "q18_large_volume_customer",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "salted_skew_aggregation",
    "scalar_conditional_null",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_regexp_extract_all",
    "scalar_regexp_funcs",
    "scalar_string_funcs",
    "setop_distinct_rows",
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "setop_union_distinct",
    "sink_dynamic_partition_overwrite",
    "sort_nulls_ordering",
    "source_csv_roundtrip",
    "source_inmemory_createdataframe",
    "source_json_roundtrip",
    "source_parquet_roundtrip",
    "subquery_scalar",
    "asof_join_latest_order",
    "dedup_clusters_materialized",
    "dedup_lsh_skew_guard",
    "feature_minmax_scale",
    "feature_standard_scale",
    "linreg_slope_1d",
    "mm_audio_frame_sample",
    "mm_image_decode_features",
    "mm_image_resize",
    "pca_covariance_matrix",
    "pca_covariance_spr",
    "pca_explained_variance",
    "pca_mean_vector",
    "pca_transform_topk",
    "q13_customer_distribution",
    "q8_market_share",
    "q9_product_type_profit",
    "stream_dedup",
    "stream_foreachbatch_sink",
    "stream_session_window",
    "stream_sliding_window",
    # -- round 10 rotation: (a) queries round 10 CHANGED — the
    # adaptive-cell IVF tiers (hashes moved at every sf where the √n
    # rule unbinds the k=10 floor) and every consumer of the rewritten
    # two-pass kmeans-oracle argmin, the four advice fixes (serpentine
    # integer DIV, modularity cached-frame reuse, Holt 1-day guard,
    # funnel empty-slice NULL), and the HITS pruned distributed rank —
    # each needs a fresh driver row on the new code; then (b) stalest
    # surviving driver rows (sampled r01/r02-era, enumerated from the
    # union of CORRECTNESS_r01..r09). (a)=15 + (b)=41 deliberately
    # overfills a 50-row driver window by 6: the scalar_* tail of (b)
    # rides just past the boundary and leads the NEXT rotation (it
    # stays ahead of the round-9 remainder below), so nothing is
    # silently dropped — only deferred one round. Names absent from
    # the registry are skipped, so the list is safe across partial
    # loads.
    "sim_ivf_topk",
    "sim_ivf_persisted_probe",
    "sim_ivf_pq_hybrid_topk",
    "kmeans_embedding_clusters",
    "ml_kmeans_silhouette",
    "dedup_semantic_clusters",
    "pipe_shard_bin_packing",
    "graph_community_modularity",
    "timeseries_holt_linear_forecast",
    "events_funnel_time_to_convert",
    "graph_hits_hubs_authorities",
    "graph_kcore_peeling",
    "stream_stateful_ewma",
    "graph_pagerank_bipartite",
    "pipe_curate_budget_pack",
    # (b) stalest surviving driver rows
    "join_composite_key_argmax",
    "join_cross",
    "join_full_outer",
    "join_inner_basic",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_right_outer",
    "join_theta_range",
    "json_extract_events",
    "json_from_json_agg",
    "scalar_datetime_extra",
    "timeseries_gap_fill",
    "bucketed_join_no_shuffle",
    "limit_offset_page",
    "map_funcs",
    "mm_binary_payload",
    "mm_struct_bundle",
    "null_safe_equality",
    "partitioned_write_pruned_read",
    "pipe_contamination_overlap",
    "pipe_deterministic_split",
    "pipe_stratified_sample",
    "q14_promotion_effect",
    "q15_top_supplier",
    "q16_supplier_part_types",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q20_part_promotion_suppliers",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "salted_skew_aggregation",
    "scalar_conditional_null",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_regexp_extract_all",
    "scalar_regexp_funcs",
    # ---- retained pre-round-10 tail (ignored once the 50-slot window
    # fills; kept so a larger driver budget keeps walking backwards) --
    "dedup_semantic_clusters",
    "sim_ivf_pq_hybrid_topk",
    "agg_mann_whitney_u",
    "graph_hits_hubs_authorities",
    "timeseries_holt_linear_forecast",
    "agg_cramers_v_association",
    "stream_cusum_monitor",
    "scale_aqe_skew_join_split",
    "agg_spearman_rank_corr",
    "text_rake_keywords",
    "text_pii_detection_scrub",
    "sql_identifier_clause",
    "events_funnel_time_to_convert",
    "dq_iqr_outlier_audit",
    "agg_mutual_information",
    "events_stl_anomaly_flags",
    "graph_community_modularity",
    "graph_label_propagation",
    "agg_ks_two_sample",
    "text_gopher_quality_filter",
    "text_zipf_law_fit",
    "timeseries_stl_decompose",
    "timeseries_cusum_changepoint",
    "pipe_shard_bin_packing",
    "pipe_curriculum_stages",
    "source_binaryfile_format",
    # (a) changed by round 9
    "dq_psi_distribution_drift",
    "events_rfm_segmentation",
    "pipe_token_budget_selection",
    "text_vocab_coverage_curve",
    "sim_pq_adc_topk",
    "sim_ivf_topk",
    "kmeans_embedding_clusters",
    # (b) stalest surviving driver rows
    "agg_bitwise",
    "array_basic_ops",
    "array_explode_tokens",
    "array_higher_order_vec",
    "array_posexplode",
    "array_set_ops",
    "dedup_duplicate_clusters",
    "dedup_embedding_cosine_pairs",
    "dedup_exact_all_columns",
    "dedup_exact_by_hash",
    "dedup_exact_text",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash",
    "histogram_fixed_buckets",
    "join_broadcast_dim",
    "join_composite_key_argmax",
    "join_cross",
    "join_full_outer",
    "join_inner_basic",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_right_outer",
    "join_theta_range",
    "json_extract_events",
    "json_from_json_agg",
    "scalar_datetime_extra",
    "timeseries_gap_fill",
    "bucketed_join_no_shuffle",
    "limit_offset_page",
    "map_funcs",
    "mm_binary_payload",
    "mm_struct_bundle",
    "null_safe_equality",
    "partitioned_write_pruned_read",
    "pipe_contamination_overlap",
    "pipe_deterministic_split",
    "pipe_stratified_sample",
    "q14_promotion_effect",
    "q15_top_supplier",
    "q16_supplier_part_types",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
]


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from spark_rapids_ml_spark.operators import (  # noqa: F401
        llm_pipeline,
        misc,
        multimodal,
        relational,
        scalar_funcs,
        scale_patterns,
        setops,
        sources_io,
        subqueries,
        textstats,
        timeseries,
        udf_surface,
        windows,
    )
    from spark_rapids_ml_spark import ml_queries  # noqa: F401
    from spark_rapids_ml_spark.streaming import stream_queries  # noqa: F401
    from spark_rapids_ml_spark.operators import (  # noqa: F401
        aggregates,
        analytics_extra,
        arrays_json,
        curation,
        dedup,
        evalmetrics,
        graph,
        joins,
        similarity,
    )


def all_queries() -> dict[str, QuerySpec]:
    """Every declared query, SWEEP_PRIORITY names first (see above),
    then the rest in registration order."""
    load_all_modules()
    ordered = {n: QUERIES[n] for n in SWEEP_PRIORITY if n in QUERIES}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    return ordered

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
    # -- round 8 rotation: (a) the queries round 8 changed or added —
    # the distributed-scan refactors, the adaptive LSH tier, the df
    # ceiling + its new guard query — each needs a fresh driver row on
    # the new code; then (b) the 29 queries never driver-sampled
    # through r07 (union of CORRECTNESS_r01..r07 vs the registry),
    # closing the evidence gap VERDICT r7 named; then (c) stalest
    # surviving driver rows. Names absent from the registry are
    # skipped, so the list is safe across partial loads.
    "sim_tfidf_df_ceiling_guard",
    "agg_exact_quantiles_scan",
    "agg_weighted_quantiles_scan",
    "ps_pandas_api_pivot_table",
    "agg_pareto_share_scan",
    "events_weekday_seasonality",
    "events_uplift_by_segment",
    "dq_psi_distribution_drift",
    "agg_hhi_concentration",
    "pipe_curate_budget_pack",
    "pca_covariance_incremental_merge",
    "stream_incremental_covariance",
    "graph_degree_distribution_ccdf",
    "sim_sparse_tfidf_cosine_pairs",
    "sim_lsh_bucketed_topk",
    "sim_lsh_persisted_probe",
    "events_rfm_segmentation",
    "pipe_token_budget_selection",
    "text_vocab_coverage_curve",
    "pipe_sequence_packing",
    "pipe_bpe_tokenize_pack",
    "graph_kcore_peeling",
    "pipe_chunk_documents",
    # (b) never driver-sampled through r07
    "stream_stateful_ewma",
    "sink_snapshot_expire_vacuum",
    "scalar_interval_arithmetic",
    "sink_lakehouse_lifecycle",
    "stream_cdf_apply_replica",
    "scale_partition_evolution",
    "agg_bitmap_distinct_rollup",
    "dq_constraint_checks",
    "events_cohort_retention",
    "events_funnel_conversion",
    "events_rolling_zscore_anomaly",
    "join_interval_overlap_binned",
    "join_null_aware_anti",
    "mm_image_perceptual_hash",
    "mm_video_frame_sample",
    "pipe_bpe_apply_tokens",
    "pipe_bpe_train_merges",
    "pipe_mixture_sampling",
    "scale_runtime_bloom_filter_join",
    "scd2_dimension_build",
    "sink_merge_on_read_deletes",
    "sink_python_datasource_writer",
    "sink_snapshot_time_travel",
    "stream_file_sink_exactly_once",
    "stream_incremental_dedup_lsh",
    "timeseries_resample_ohlc",
    "udf_arrow_scalar_tokenstats",
    # (c) stalest surviving driver rows (r01/r02 prefix)
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

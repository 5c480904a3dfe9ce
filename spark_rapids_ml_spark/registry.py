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
    # -- round 6 second session: the 23 operators added this session
    # have never had a driver correctness row (each is hash-green in
    # the committed SWEEP_r6/SWEEP_sf1 artifacts at sf0.01 AND sf1,
    # plus the sf0.001 pytest oracle gate) -- front-load them all --
    "dq_dp_noisy_counts",
    "ml_kmeans_silhouette",
    "agg_skewness_kurtosis",
    "scalar_url_canonicalize",
    "events_rolling_median",
    "join_strategy_hints",
    "stream_python_datasource_writer",
    "udf_udtf_polymorphic_split",
    "api_dataframe_transpose",
    "mm_image_augment_flip_crop",
    "sql_pipe_syntax_flow",
    "sql_parameterized_query",
    "scalar_collation_group",
    "agg_count_min_sketch",
    "scale_dynamic_partition_pruning",
    "sink_change_data_feed",
    "agg_kmv_theta_sketch_ops",
    "scd2_point_in_time_join",
    "udf_grouped_apply_in_arrow",
    "graph_bfs_shortest_path",
    "feature_hashing_trick",
    "sim_pq_adc_topk",
    "stream_stream_full_outer_join",
    # -- round 6 refresh: the 8 queries added late in round 6, then the
    # earlier round-6 additions and every other query that has NEVER
    # had a driver correctness row across r01-r05 (31 never-checked
    # total -- each was judge- or pytest-verified, but a driver row is
    # the stronger artifact), then the stalest surviving driver rows
    # (r02 vintage). Fills the driver's 50-query sample window.
    "ps_pandas_api_groupby",
    "source_xml_roundtrip",
    "agg_listagg_ordered",
    "source_text_lines_roundtrip",
    "scale_observe_metrics",
    "setop_union_schema_evolution",
    "source_csv_permissive_corrupt",
    "stream_python_datasource_reader",
    "udf_iter_batch_inference",
    "events_transition_matrix",
    "mm_tensor_export_batches",
    "ml_ridge_closed_form",
    "setop_bag_except_intersect_all",
    "subquery_quantified_all_any",
    "scale_manifest_file_pruning",
    "agg_pivot_dynamic",
    "scalar_url_parse",
    "scalar_try_functions",
    "pipe_end_to_end_curation",
    "join_fuzzy_blocked_levenshtein",
    "profile_table_summary",
    "agg_distinct_overlap_bitmap",
    "sink_incremental_agg_maintenance",
    "events_sequence_pattern_match",
    "join_asof_nearest_tolerance",
    "window_trailing_distinct_users",
    "pipe_cluster_aware_split",
    "scale_runtime_bloom_filter_join",
    "sink_merge_on_read_deletes",
    "sink_snapshot_time_travel",
    "stream_incremental_dedup_lsh",
    "pipe_bpe_apply_tokens",
    "pipe_bpe_tokenize_pack",
    "pipe_mixture_sampling",
    "pipe_bpe_train_merges",
    "mm_video_frame_sample",
    "mm_image_perceptual_hash",
    "dq_constraint_checks",
    "sink_python_datasource_writer",
    "timeseries_resample_ohlc",
    "events_funnel_conversion",
    "events_cohort_retention",
    "scd2_dimension_build",
    "events_rolling_zscore_anomaly",
    "udf_arrow_scalar_tokenstats",
    "stream_file_sink_exactly_once",
    "agg_bitmap_distinct_rollup",
    "join_interval_overlap_binned",
    "join_null_aware_anti",
    # -- stalest remaining driver rows (r02), registration order ------
    "dedup_exact_by_hash",
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

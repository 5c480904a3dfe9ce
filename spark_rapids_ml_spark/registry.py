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
# Rounds 1-3 covered the aggregate/array/dedup/join/relational/scalar/
# setop/source/llm-pipe prefix; round 4 front-loads the 42 queries that
# have never had a driver CORRECTNESS row (windows, text, streaming,
# subqueries, ML, timeseries, UDF surface, materialized clusters), the
# 3 multimodal queries whose oracles are new this round, and this
# round's new/changed queries. Names absent from the registry are
# skipped, so the list is safe across partial loads.
SWEEP_PRIORITY: list[str] = [
    # -- never driver-checked through r03 (42) ------------------------
    "subquery_in",
    "subquery_exists_correlated",
    "subquery_not_exists_correlated",
    "subquery_correlated_scalar_agg",
    "text_token_count",
    "text_corpus_stats",
    "text_tfidf_top_terms",
    "text_quality_score",
    "text_langid_profile",
    "text_fingerprint",
    "text_winnow_fingerprint",
    "asof_join_latest_order",
    "timeseries_multi_rollup",
    "udf_grouped_map_zscore",
    "udf_udtf_bigrams",
    "udf_grouped_agg_weighted_avg",
    "window_rank_family",
    "window_distribution_ranks",
    "window_lag_lead",
    "window_running_sum",
    "window_range_frame",
    "window_first_last",
    "window_topk_per_group",
    "pca_mean_vector",
    "pca_covariance_matrix",
    "pca_covariance_spr",
    "linreg_slope_1d",
    "feature_standard_scale",
    "feature_minmax_scale",
    "kmeans_embedding_clusters",
    "pca_explained_variance",
    "pca_transform_topk",
    "stream_tumbling_window",
    "stream_tumbling_append_watermark",
    "stream_sliding_window",
    "stream_session_window",
    "stream_static_join",
    "stream_stream_interval_join",
    "stream_dedup",
    "stream_foreachbatch_sink",
    "stream_stateful_user_stats",
    "dedup_clusters_materialized",
    # -- oracles new in round 4 (were no_oracle rows) -----------------
    "mm_image_decode_features",
    "mm_audio_frame_sample",
    "mm_image_resize",
    # -- queries new or changed in round 4 (the 50-query window is
    # full: q10/q12 and the result-identical perf-only changes
    # (sim_bruteforce_topk) rotate to the front of the NEXT round) ----
    "dedup_lsh_skew_guard",
    "q9_product_type_profit",
    "q8_market_share",
    "q13_customer_distribution",
    "sim_ivf_topk",
    # -- round-5 front of queue ---------------------------------------
    "q10_returned_items",
    "q12_shipmode_priority",
    "q11_important_stock",
    "text_bigram_lm_score",
    "dedup_simhash_hamming_pairs",
    "sim_quantized_topk",
    "sim_bruteforce_topk",
    "dedup_embedding_lsh_pairs",
    # new operators added late in round 4, never driver-checked
    "join_range_binned_count",
    "window_sessionize_gaps",
    "sink_merge_upsert",
    "text_repetition_stats",
    "text_term_redaction",
    "stream_stream_left_outer_join",
    "layout_zorder_buckets",
    "pipe_group_reservoir_sample",
    "graph_pagerank_bipartite",
    "agg_hll_sketch_merge",
    "udf_map_in_arrow_textstats",
    "source_python_datasource",
    "skew_join_hot_key_isolation",
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

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
    # -- round 12 rotation head: (a) queries round 12 ADDED or
    # CHANGED — the composed drift-gate -> retrain -> streaming
    # re-ingest lifecycle (new), the Arrow-batched rewrite of the flat
    # SQ coarse scan, the PSI monitor (ROUND(.,9) ln-ulp guard moved
    # the psi_micro values), the IVF-SQ hybrid and streaming ingest
    # (query-filtered re-rank broadcast / checkpoint-cleanup refactor;
    # values unchanged — the fresh driver rows prove it). The rest of
    # the window follows tools/staleness.py least-recently-sampled
    # order (STALENESS.md is the auditable artifact).
    "stream_ann_drift_retrain_lifecycle",
    "sim_quantized_topk",
    "dq_embedding_drift_psi",
    "sim_ivf_sq_hybrid_topk",
    "stream_ivf_index_ingest",
    # -- round 12 window tail: the 45 least-recently-sampled queries
    # (STALENESS.md order) — the 30 remaining r04-era rows, then the
    # oldest 15 of the r05 cohort.
    "stream_foreachbatch_sink",
    "stream_session_window",
    "stream_sliding_window",
    "stream_stateful_user_stats",
    "stream_static_join",
    "stream_stream_interval_join",
    "stream_tumbling_append_watermark",
    "stream_tumbling_window",
    "subquery_correlated_scalar_agg",
    "subquery_exists_correlated",
    "subquery_in",
    "subquery_not_exists_correlated",
    "text_corpus_stats",
    "text_fingerprint",
    "text_langid_profile",
    "text_quality_score",
    "text_tfidf_top_terms",
    "text_token_count",
    "text_winnow_fingerprint",
    "timeseries_multi_rollup",
    "udf_grouped_agg_weighted_avg",
    "udf_grouped_map_zscore",
    "udf_udtf_bigrams",
    "window_distribution_ranks",
    "window_first_last",
    "window_lag_lead",
    "window_range_frame",
    "window_rank_family",
    "window_running_sum",
    "window_topk_per_group",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "agg_argmax_argmin",
    "agg_collect_list_sorted",
    "agg_corr",
    "agg_count_distinct_multi",
    "agg_cube",
    "agg_freq_items_merge",
    "agg_group_stats",
    "agg_grouping_sets",
    "agg_having",
    "agg_hll_sketch_merge",
    "agg_moments_exact",
    "agg_percentiles_exact",
    "agg_pivot",
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

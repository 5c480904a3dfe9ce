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
    # -- round 5: new or changed this round (4) -----------------------
    "stream_stream_left_outer_join",  # sentinel-schema fix
    "sim_lsh_persisted_probe",  # new: persisted bucketed LSH index
    "agg_freq_items_merge",  # new: mergeable heavy-hitters sketch
    "sim_lsh_bucketed_topk",  # refactored onto shared _rerank_topk
    "agg_quantile_sketch_merge",  # new: mergeable quantile summaries
    "sim_ivf_persisted_probe",  # new: cell-partitioned IVF index
    "source_orc_roundtrip",  # new: ORC sink/source roundtrip
    "subquery_lateral_topn",  # new: LATERAL correlated derived table
    "agg_unpivot_measures",  # new: native unpivot reshape
    "stream_rocksdb_state_window",  # new: RocksDB state backend
    "json_variant_extract",  # new: Spark 4 VARIANT typed extraction
    "sql_recursive_cte_hierarchy",  # new: WITH RECURSIVE walk
    "scalar_xml_roundtrip",  # new: to_xml/from_xml codec fidelity
    "layout_compaction_rewrite",  # new: small-files compaction
    "ml_naive_bayes_langid",  # new: NB train+score, exact counting
    "graph_triangle_count",  # new: oriented triangle join
    # -- never driver-checked (late round-4 additions) + stalest
    # driver rows (r02) (19) ------------------------------------------
    "q10_returned_items",
    "q12_shipmode_priority",
    "q11_important_stock",
    "text_bigram_lm_score",
    "dedup_simhash_hamming_pairs",
    "sim_quantized_topk",
    "sim_bruteforce_topk",
    "dedup_embedding_lsh_pairs",
    "join_range_binned_count",
    "window_sessionize_gaps",
    "sink_merge_upsert",
    "text_repetition_stats",
    "text_term_redaction",
    "layout_zorder_buckets",
    "pipe_group_reservoir_sample",
    "graph_pagerank_bipartite",
    "agg_hll_sketch_merge",
    "udf_map_in_arrow_textstats",
    "source_python_datasource",
    "skew_join_hot_key_isolation",
    # -- oldest remaining driver rows (r02), registration order (27) --
    "agg_group_stats",
    "agg_moments_exact",
    "agg_corr",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_pivot",
    "agg_percentiles_exact",
    "agg_approx_percentile",
    "agg_collect_list_sorted",
    "agg_approx_count_distinct",
    "agg_count_distinct_multi",
    "agg_argmax_argmin",
    "scalar_datetime_extra",
    "agg_bitwise",
    "histogram_fixed_buckets",
    "timeseries_gap_fill",
    "array_basic_ops",
    "array_explode_tokens",
    "array_posexplode",
    "array_higher_order_vec",
    "array_set_ops",
    "json_extract_events",
    "json_from_json_agg",
    "dedup_exact_text",
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

"""Semantic pins for the curation operators beyond the hash oracle:
blocking soundness for the fuzzy join, single-scan shape for the
profiler, inclusion-exclusion consistency for the bitmap overlap,
and retry-idempotence for the incremental aggregate sink."""

from __future__ import annotations

from spark_rapids_ml_spark.operators.curation import (
    agg_distinct_overlap_bitmap,
    join_fuzzy_blocked_levenshtein,
    profile_table_summary,
    sink_incremental_agg_maintenance,
)

SF = "/root/testdata/sf0.001"


def test_fuzzy_join_blocking_and_known_pairs(spark):
    rows = join_fuzzy_blocked_levenshtein(spark, SF).collect()
    assert rows, "expected near-match pairs in the part vocabulary"
    for r in rows:
        # Blocking soundness: pairs never cross the noun block.
        assert r.name_a.split(" ")[1] == r.noun
        assert r.name_b.split(" ")[1] == r.noun
        assert 1 <= r.lev_d <= 2
        assert r.name_a < r.name_b  # canonical orientation, no dupes
    # The vocabulary pins real matches: 'cold X' ~ 'old X' at distance 1.
    pairs = {(r.name_a, r.name_b): r.lev_d for r in rows}
    assert pairs.get(("cold anvil", "old anvil")) == 1
    assert pairs.get(("new anvil", "red anvil")) == 2


def test_profile_summary_single_scan_and_consistency(spark):
    df = profile_table_summary(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # One pass over the data: exactly one parquet scan feeds every
    # per-column metric (multi-count-distinct planned via Expand).
    assert plan.count("Scan parquet") == 1, plan
    rows = {r.col_name: r for r in df.collect()}
    assert set(rows) == {
        "l_linenumber",
        "l_linestatus",
        "l_orderkey",
        "l_partkey",
        "l_returnflag",
        "l_suppkey",
    }
    totals = {r.n_nonnull + r.n_null for r in rows.values()}
    assert len(totals) == 1  # every column profiled over the same rowcount
    for r in rows.values():
        assert 0 < r.n_distinct <= r.n_nonnull
        # min <= max in the column's own domain (numeric when parseable)
        try:
            assert float(r.min_val) <= float(r.max_val)
        except ValueError:
            assert r.min_val <= r.max_val


def test_bitmap_overlap_inclusion_exclusion(spark):
    r = agg_distinct_overlap_bitmap(spark, SF).first()
    assert r.n_intersect == r.n_a + r.n_b - r.n_union
    assert 0 <= r.n_intersect <= min(r.n_a, r.n_b)
    assert max(r.n_a, r.n_b) <= r.n_union <= r.n_a + r.n_b
    assert 0.0 <= r.jaccard <= 1.0


def test_incremental_agg_retry_idempotent(spark):
    """The delta append uses dynamic partition overwrite: re-running
    the whole maintenance job (a retry) must not double-count."""
    first = sink_incremental_agg_maintenance(spark, SF).collect()
    second = sink_incremental_agg_maintenance(spark, SF).collect()
    assert first == second
    assert sum(r.n for r in first) > 0

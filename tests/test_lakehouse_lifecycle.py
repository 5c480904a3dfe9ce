"""Semantic pins for the composed lakehouse lifecycle beyond the hash
oracle: the feed-replay invariant (v1 + feed = compacted v3), feed
well-formedness, and compaction preserving the MOR live view."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_rapids_ml_spark.operators.sources_io import (
    LC_DEL_MOD,
    LC_KEY_OFFSET,
    _sink,
    sink_lakehouse_lifecycle,
)

SF = "/root/testdata/sf0.001"


def _committed(spark, name):
    root = _sink("lakehouse_lifecycle", SF)
    return spark.read.parquet(os.path.join(root, name))


def test_feed_replay_reproduces_compacted_state(spark):
    # run the composed query (writes v1/v2/deletes/v3/feed), then replay
    # the feed against v1 and require row-for-row equality with v3 —
    # the contract a downstream incremental consumer depends on.
    sink_lakehouse_lifecycle(spark, SF).collect()
    v1 = _committed(spark, "v1")
    v3 = _committed(spark, "v3")
    feed = _committed(spark, "feed")

    ins = feed.where(F.col("change_type") == "insert").select("k", "price")
    dele = feed.where(F.col("change_type") == "delete").select("k")
    post = feed.where(F.col("change_type") == "update_postimage").select(
        "k", F.col("price").alias("new_price")
    )
    replayed = (
        v1.join(dele, "k", "left_anti")
        .join(post, "k", "left")
        .select(
            "k",
            "prio",
            F.coalesce("new_price", "price").alias("price"),
        )
    )
    # inserted rows carry no prio in the feed; recover it from v2 (the
    # consumer's column source for inserts is the post-merge snapshot)
    v2 = _committed(spark, "v2")
    ins_full = v2.join(ins.select("k"), "k", "left_semi")
    replayed = replayed.unionByName(ins_full.select("k", "prio", "price"))

    diff_a = replayed.exceptAll(v3)
    diff_b = v3.exceptAll(replayed)
    assert diff_a.count() == 0 and diff_b.count() == 0
    assert v3.count() == replayed.count()


def test_compaction_preserves_mor_live_view(spark):
    sink_lakehouse_lifecycle(spark, SF).collect()
    v2 = _committed(spark, "v2")
    dv = _committed(spark, "deletes")
    v3 = _committed(spark, "v3")
    live = v2.join(dv, "k", "left_anti")
    assert live.exceptAll(v3).count() == 0
    assert v3.exceptAll(live).count() == 0
    # no deleted key survives compaction
    assert v3.where(F.col("k") % LC_DEL_MOD == 0).count() == 0


def test_feed_well_formed(spark):
    sink_lakehouse_lifecycle(spark, SF).collect()
    feed = _committed(spark, "feed")
    types = {r.change_type for r in feed.select("change_type").distinct().collect()}
    assert types == {"insert", "delete", "update_preimage", "update_postimage"}
    # pre/post come in matched pairs per key
    pre = feed.where(F.col("change_type") == "update_preimage").select("k")
    post = feed.where(F.col("change_type") == "update_postimage").select("k")
    assert pre.exceptAll(post).count() == 0 and post.exceptAll(pre).count() == 0
    # inserts are exactly the surviving shifted-key band
    ins_keys = feed.where(F.col("change_type") == "insert")
    assert ins_keys.where(F.col("k") < LC_KEY_OFFSET).count() == 0


def test_lifecycle_stage_plan_shapes(spark):
    """100 TB safety: the MOR read applies the deletion sidecar as a
    BROADCAST anti-join (the sidecar is O(deleted keys), never the
    table), and the CDF diff plans as an equi full-outer join — no
    nested loop / cartesian anywhere in the lifecycle's joins."""
    from spark_rapids_ml_spark.plans.explain import formatted

    sink_lakehouse_lifecycle(spark, SF).collect()
    v1 = _committed(spark, "v1")
    v2 = _committed(spark, "v2")
    dv = _committed(spark, "deletes")
    v3 = _committed(spark, "v3")

    live_txt = formatted(v2.join(dv, "k", "left_anti"))
    assert "BroadcastHashJoin" in live_txt and "LeftAnti" in live_txt
    assert "CartesianProduct" not in live_txt
    assert "BroadcastNestedLoopJoin" not in live_txt

    diff_txt = formatted(
        v1.select("k", F.col("price").alias("old_price")).join(
            v3.select("k", F.col("price").alias("new_price")), "k", "full_outer"
        )
    )
    assert "SortMergeJoin" in diff_txt or "ShuffledHashJoin" in diff_txt
    assert "FullOuter" in diff_txt
    assert "CartesianProduct" not in diff_txt
    assert "BroadcastNestedLoopJoin" not in diff_txt

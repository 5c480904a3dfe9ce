"""Semantic pins for the second round-7 operator wave, beyond the
hash oracle: Bloom's no-false-negative guarantee and adaptive sizing,
k-core monotone shrinkage, length-bucket padding accounting, and EWMA
boundary values."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_rapids_ml_spark.operators import aggregates as agg
from spark_rapids_ml_spark.operators import graph as g
from spark_rapids_ml_spark.operators import llm_pipeline as lp
from spark_rapids_ml_spark.operators import timeseries as ts
from spark_rapids_ml_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_designed_fp_rate(spark):
    row = agg.agg_bloom_filter_membership(spark, SF).collect()[0]
    assert row.false_neg == 0  # the Bloom guarantee
    assert row.claimed_pos == row.true_pos + row.false_pos
    # m = 8n, k = 3 -> expected fp ~ 3%; assert the rate is sane (not
    # saturated, not zero-probe): below 15% of the non-member probes.
    n_non_members = row.n_probed - row.true_pos
    assert n_non_members > 0
    assert row.false_pos <= 0.15 * n_non_members


def test_kcore_trajectory_monotone(spark):
    rows = g.graph_kcore_peeling(spark, SF).collect()
    assert [r.round for r in rows] == [0, 1, 2, 3, 4]
    ks = {r.k for r in rows}
    assert len(ks) == 1 and ks.pop() >= 1
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges
    # round 1 must actually peel (k = mean degree + 1 guarantees some
    # node sits below the mean)
    assert rows[1].n_nodes < rows[0].n_nodes


def test_length_buckets_partition_and_account_padding(spark):
    rows = lp.pipe_length_bucket_batches(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs  # every doc batched once
    for r in rows:
        assert 1 <= r.n_docs <= lp.LB_BATCH_SIZE
        assert r.pad_waste == r.n_docs * r.max_tok - r.sum_tok
        assert 0 <= r.bucket <= lp.LB_BUCKET_MAX
        if r.bucket < lp.LB_BUCKET_MAX:
            # bucket invariant: max length inside a closed bucket stays
            # below the next rung boundary
            assert r.max_tok < (r.bucket + 1) * lp.LB_BUCKET_WIDTH


def test_ewma_first_row_equals_value_and_bounds(spark):
    out = {r.event_id: r.ewma for r in ts.timeseries_ewma_halflife(spark, SF).collect()}
    e = (
        load(spark, SF, "events")
        .where(F.col("user_id") % ts.EWMA_USER_MOD == 7)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in e:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        # first event: EWMA == the (micro-quantized) value itself
        first = rows[0]
        assert abs(out[first.event_id] - round(first.value * 1e6) / 1e6) < 1e-9
        lo = min(r.value for r in rows)
        hi = max(r.value for r in rows)
        for r in rows:
            assert lo - 1e-6 <= out[r.event_id] <= hi + 1e-6  # convex combination


def test_stream_ewma_batch_boundary_invariance(spark, tmp_path):
    """The stateful streaming EWMA must produce identical output
    whether the events arrive as ONE micro-batch or as THREE
    time-split micro-batches — the state carry-over is exactly the
    trailing frame, so batching cannot shift any EWMA."""
    import os
    import time

    from pyspark.sql import functions as F

    from spark_rapids_ml_spark.streaming import stream_queries as sq

    declared = {
        (r.user_id, r.event_id): r.ewma
        for r in sq.stream_stateful_ewma(spark, SF).collect()
    }

    ev = sq.normalize_event_ts(
        spark.read.schema(
            spark.read.parquet(f"{SF}/events.parquet").schema
        ).parquet(f"{SF}/events.parquet")
    )
    qs = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    src = str(tmp_path / "staged")
    bounds = [(None, qs[0]), (qs[0], qs[1]), (qs[1], None)]
    for i, (lo, hi) in enumerate(bounds):
        part = ev
        if lo is not None:
            part = part.where(F.col("event_id") > lo)
        if hi is not None:
            part = part.where(F.col("event_id") <= hi)
        # event_id is assigned in ts order in the generator, so the
        # three ranges are time-ordered slabs; mtime staggers them so
        # maxFilesPerTrigger=1 replays them in order
        d = f"{src}/b{i}"
        part.coalesce(1).write.parquet(d)
        time.sleep(1.1)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f))

    s = sq._read_stream(
        spark, SF, src_dir=f"{src}/b*", one_file_per_trigger=True
    ).where(F.col("user_id") % sq.EWMA_STATE_USER_MOD == 7)
    res = sq._run_to_memory(sq._ewma_stateful_of(s), "update")
    replayed = {
        (r.user_id, r.event_id): r.ewma
        for r in res.select("user_id", "event_id", "ewma").collect()
    }
    assert replayed == declared

"""Semantic pins for the second-session round-6 operators beyond the
hash oracle: the CDC reconstruction contract (v1 + feed = v2), KMV
sketch accuracy and exact-degradation, and point-in-time join
no-future-leakage."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_rapids_ml_spark.operators.aggregates import (
    KMV_K,
    agg_kmv_theta_sketch_ops,
)
from spark_rapids_ml_spark.operators.sources_io import (
    CDF_DELETE_MOD,
    CDF_INSERT_MOD,
    CDF_UPDATE_MOD,
    sink_change_data_feed,
)
from spark_rapids_ml_spark.operators.timeseries import scd2_point_in_time_join
from spark_rapids_ml_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def test_cdf_reconstructs_v2_from_v1(spark):
    """The CDC contract: applying the change feed to v1 yields v2."""
    feed = {(r.o_orderkey, r.change_type): r.price
            for r in sink_change_data_feed(spark, SF).collect()}
    o = load(spark, SF, "orders").select("o_orderkey", "o_totalprice").collect()
    v1 = {r.o_orderkey: r.o_totalprice for r in o
          if r.o_orderkey % CDF_INSERT_MOD != 0}
    v2_expected = {}
    for r in o:
        if r.o_orderkey % CDF_DELETE_MOD == 0:
            continue
        p = r.o_totalprice
        if r.o_orderkey % CDF_UPDATE_MOD == 0:
            p = float(round(round(p, 2) * 1.05 + 1e-9, 2))
        v2_expected[r.o_orderkey] = p
    # replay the feed over v1
    replayed = dict(v1)
    for (k, ct), price in feed.items():
        if ct == "insert":
            assert k not in replayed
            replayed[k] = price
        elif ct == "delete":
            replayed.pop(k)
        elif ct == "update_postimage":
            replayed[k] = price
        elif ct == "update_preimage":
            assert abs(v1[k] - price) < 1e-9
    assert set(replayed) == set(v2_expected)
    for k, p in replayed.items():
        assert abs(p - v2_expected[k]) < 0.011, (k, p, v2_expected[k])


def test_cdf_all_four_change_types_populated(spark):
    types = {r.change_type for r in sink_change_data_feed(spark, SF).collect()}
    assert types == {"insert", "delete", "update_preimage", "update_postimage"}


def test_kmv_exact_degradation_below_k(spark):
    """Segments smaller than k: the sketch IS the set, estimate exact."""
    row = agg_kmv_theta_sketch_ops(spark, SF).collect()[0]
    assert row.exact_a < KMV_K and row.exact_b < KMV_K
    assert row.est_a == float(row.exact_a)
    assert row.est_b == float(row.exact_b)
    assert row.est_inter == float(row.exact_inter)


def test_kmv_estimate_accuracy_at_sketch_scale(spark):
    """At sf0.01 the segments exceed k: estimates within ~3 sigma
    (sigma ~ true/sqrt(k-2)) of the exact distinct counts."""
    row = agg_kmv_theta_sketch_ops(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.exact_a > KMV_K
    for est, exact in ((row.est_a, row.exact_a), (row.est_b, row.exact_b),
                       (row.est_inter, row.exact_inter)):
        assert abs(est - exact) <= 3.0 * exact / (KMV_K - 2) ** 0.5 + 1, (est, exact)


def test_pit_join_no_future_leakage(spark):
    """Every enriched fact row uses a dimension version valid AT the
    probe ts — never a later version (feature-leakage guard) — and
    each probe matches at most one version."""
    out = scd2_point_in_time_join(spark, SF)
    rows = out.collect()
    assert rows
    assert len({r.event_id for r in rows}) == len(rows)
    e = load(spark, SF, "events")
    ch = (
        e.where(F.col("event_type").isin("signup", "purchase") & (F.col("user_id") <= 30))
        .select("user_id", "ts")
        .collect()
    )
    by_user = {}
    for r in ch:
        by_user.setdefault(r.user_id, []).append(r.ts)
    probes = {
        r.event_id: (r.user_id, r.ts)
        for r in e.where((F.col("event_type") == "click") & (F.col("user_id") <= 30)).collect()
    }
    for r in rows:
        user, ts = probes[r.event_id]
        versions = sorted(by_user[user])
        # expected version = number of changes at or before the probe ts
        expect = sum(1 for v in versions if v <= ts)
        assert r.version == expect, (r.event_id, r.version, expect)


def test_pq_adc_recall_vs_bruteforce(spark):
    """PQ+ADC with exact re-rank: recall@5 vs the exact flat scan.
    Measured 0.92 (sf0.001) / 0.94 (sf0.01); gate at 0.85."""
    from spark_rapids_ml_spark.operators.similarity import (
        sim_bruteforce_topk,
        sim_pq_adc_topk,
    )

    bf, pq = {}, {}
    for r in sim_bruteforce_topk(spark, SF).collect():
        bf.setdefault(r.qid, set()).add(r.vec_id)
    for r in sim_pq_adc_topk(spark, SF).collect():
        pq.setdefault(r.qid, set()).add(r.vec_id)
    hits = sum(len(bf[q] & pq.get(q, set())) for q in bf)
    total = sum(len(v) for v in bf.values())
    assert hits / total >= 0.85, f"recall {hits}/{total}"


def test_stream_full_outer_three_way_split_consistent(spark):
    """Every output row is matched, click-only, or error-only — the
    three partitions sum to n_rows per user, and both outer sides are
    genuinely exercised by the corpus."""
    from spark_rapids_ml_spark.streaming.stream_queries import (
        stream_stream_full_outer_join,
    )

    rows = stream_stream_full_outer_join(spark, SF).collect()
    assert rows
    assert any(r.n_click_only > 0 for r in rows), "left-null side never exercised"
    assert any(r.n_error_only > 0 for r in rows), "right-null side never exercised"
    assert any(r.n_matched > 0 for r in rows)
    for r in rows:
        assert r.n_rows == r.n_matched + r.n_click_only + r.n_error_only


def test_cms_one_sided_error_and_merge_linearity(spark):
    """CMS guarantee: estimate >= exact for every probe; and the
    sketch is linear (cell-wise sum of two half-corpus sketches equals
    the full-corpus sketch), the mergeability contract."""
    from pyspark.sql import functions as F

    from spark_rapids_ml_spark.operators.aggregates import (
        CMS_DEPTH,
        CMS_WIDTH,
        agg_count_min_sketch,
    )
    from spark_rapids_ml_spark.sources.catalog import load

    rows = agg_count_min_sketch(spark, SF).collect()
    assert rows
    assert all(r.cms_est >= r.exact_cnt for r in rows), "one-sided bound violated"

    o = load(spark, SF, "orders").select("o_custkey")
    hx = F.md5(F.concat(F.lit("cms|"), F.col("o_custkey").cast("string")))
    cells = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                (F.conv(F.substring(hx, 1 + 7 * s, 7), 16, 10).cast("bigint") % CMS_WIDTH).alias("bucket"),
            )
            for s in range(CMS_DEPTH)
        ]
    )

    def sketch_of(df):
        return {
            (r.s, r.bucket): r.cnt
            for r in df.select(F.explode(cells).alias("sb"))
            .groupBy(F.col("sb.s").alias("s"), F.col("sb.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    full = sketch_of(o)
    lo = sketch_of(o.where(F.col("o_custkey") % 2 == 0))
    hi = sketch_of(o.where(F.col("o_custkey") % 2 == 1))
    merged = dict(lo)
    for k, v in hi.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full, "cell-wise merge != full-corpus sketch"


def test_stream_pyds_writer_commit_idempotent(tmp_path):
    """The streaming Python sink's commit protocol: a replayed
    batchId must not double-publish (marker check), and abort must
    drop staging — pure-Python contract test, no Spark needed."""
    import os

    from pyspark.sql import Row

    from spark_rapids_ml_spark.streaming.stream_queries import (
        _make_jsonl_stream_sink_datasource,
    )

    d = str(tmp_path / "sink")
    os.makedirs(d)
    ds = _make_jsonl_stream_sink_datasource()({"path": d})
    w = ds.streamWriter(None, False)
    m1 = w.write(iter([Row(a=1), Row(a=2)]))
    w.commit([m1], 7)
    published = [f for f in os.listdir(d) if f.startswith("batch-00007")]
    assert len(published) == 1
    # replay of batch 7: staged again, but the marker suppresses publish
    m2 = w.write(iter([Row(a=1), Row(a=2)]))
    w.commit([m2], 7)
    published = [f for f in os.listdir(d) if f.startswith("batch-00007")]
    assert len(published) == 1, "replayed batch double-published"
    # abort drops staging entirely
    w.write(iter([Row(a=3)]))
    w.abort([], 8)
    assert not os.path.exists(os.path.join(d, "_staging"))


def test_rolling_median_robust_to_outlier(spark):
    """Median vs mean robustness: for every emitted frame the median
    equals the numpy median of that frame (replayed), and lies within
    the frame's min/max."""
    import numpy as np

    from spark_rapids_ml_spark.operators.timeseries import (
        MEDIAN_FRAME,
        events_rolling_median,
    )

    out = {r.event_id: r.med for r in events_rolling_median(spark, SF).collect()}
    assert out
    e = (
        load(spark, SF, "events")
        .where(F.col("user_id") <= 20)
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user = {}
    for r in sorted(e, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    w = MEDIAN_FRAME
    n_checked = 0
    for rows in by_user.values():
        vals = [r.value for r in rows]
        for i, r in enumerate(rows):
            if r.event_id in out and w <= i < len(rows) - w:
                frame = vals[i - w : i + w + 1]
                assert out[r.event_id] == float(np.median(frame))
                n_checked += 1
    assert n_checked == len(out)


def test_silhouette_scores_in_range(spark):
    from spark_rapids_ml_spark.ml_queries import ml_kmeans_silhouette

    rows = ml_kmeans_silhouette(spark, SF).collect()
    assert len(rows) == 4
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.n > 0

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set is every registry entry flagged bench=True — one per
operator family (scan+agg, join, window, dedup, LSH, TF-IDF, PCA,
streaming) — executed once after a warm-up query so JVM/codegen
startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_rapids_ml_spark.registry import all_queries
from spark_rapids_ml_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in all_queries().items() if s.bench}

    # warm-up: JVM + Arrow + parquet footer caches
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from pyspark.sql import functions as F

    from spark_rapids_ml_spark.operators.dedup import release_caches

    timings: dict[str, float] = {}
    for name in sorted(specs):
        spec = specs[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # consume EVERY output column (count() would let Catalyst prune
        # the projections, under-billing expression-heavy queries); one
        # hash-sum row also counts via the same pass. xxhash64 rejects
        # MapType — serialize maps (and anything else unhashable)
        # through to_json first.
        hashable = [
            F.to_json(c) if t.typeName() in ("map",) else F.col(c)
            for c, t in ((f.name, f.dataType) for f in df.schema.fields)
        ]
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*hashable).cast("decimal(28,0)")).alias("h"),
        ).collect()[0]
        timings[name] = round(time.perf_counter() - t0, 3)
        release_caches()
        print(f"# {name}: {timings[name]:.3f}s ({row['n']} rows)", file=sys.stderr)

    # streaming throughput: rows/s of raw events through the watermarked
    # tumbling-window pipeline (the 100 TB backfill rate indicator)
    n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    t0 = time.perf_counter()
    specs_all = all_queries()
    df = specs_all["stream_tumbling_window"].fn(spark, sf_dir)
    df.agg(F.count(F.lit(1))).collect()
    stream_wall = time.perf_counter() - t0
    stream_rows_per_sec = round(n_events / stream_wall, 1)
    print(
        f"# streaming_throughput: {n_events} events in {stream_wall:.3f}s "
        f"= {stream_rows_per_sec} rows/s",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": cpus,
                "streaming_rows_per_sec": stream_rows_per_sec,
            }
        )
    )


if __name__ == "__main__":
    main()

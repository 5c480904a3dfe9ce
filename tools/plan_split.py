"""Per-query plan-vs-exec split: time (a) fn() — plan construction plus
any internal driver actions (eager checkpoints, training loops), (b)
the first full materialization (toPandas), (c) a SECOND
materialization of the same DataFrame — pure re-analysis + re-exec of
the returned plan. A query whose (a) dwarfs (b) is Catalyst-bound the
way round-10's HITS was (138 s plan construction, 0.25 s exec).

Usage: SPARK_GRAFT_SF_DIR=... python tools/plan_split.py name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_rapids_ml_spark.registry import all_queries
from spark_rapids_ml_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plansplit", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from spark_rapids_ml_spark.operators.dedup import release_caches

    specs = all_queries()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for name in sys.argv[1:]:
        spec = specs[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = len(df.toPandas())
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.toPandas()
        t_second = time.perf_counter() - t0
        release_caches()
        print(json.dumps({"query": name, "build_s": round(t_build, 3),
                          "first_exec_s": round(t_first, 3),
                          "re_exec_s": round(t_second, 3), "rows": n}))


if __name__ == "__main__":
    main()

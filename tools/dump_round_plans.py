"""Dump .explain('formatted') for named queries (default: every
bench-flagged headline row) into plans/<tag>/<query>_<suffix>.txt —
the optimization-round before/after evidence files.

Usage:
  SPARK_GRAFT_SF_DIR=... python tools/dump_round_plans.py r13 before [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_rapids_ml_spark.registry import all_queries
from spark_rapids_ml_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plandump", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from spark_rapids_ml_spark.operators.dedup import release_caches

    specs = all_queries()
    names = sys.argv[3:] or sorted(n for n, s in specs.items() if s.bench)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        release_caches()
        print(f"dumped {name}", flush=True)


if __name__ == "__main__":
    main()

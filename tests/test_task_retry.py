"""Task-retry chaos: a failed-and-retried task must contribute the
IDENTICAL partial result, so query output is invariant to retries.

This is the determinism property the whole engine's exact-integer /
exact-decimal partial-aggregation discipline buys at cluster scale,
where task retries are routine (spot preemption, executor loss): a
float-summing kernel could legally produce a different accumulation
order on the retried attempt, but integer partials cannot differ.

Spark's local[N] master never retries (maxFailures=1), so the chaos
run executes in a SUBPROCESS on a dedicated local[4, 2] session (2
attempts per task) with a poison kernel that fails the first attempt
of one partition via a filesystem marker. The test asserts (a) the
failure genuinely happened and was retried, (b) the result equals the
clean run bit-for-bit.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import glob, json, os, sys

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

marker_dir = sys.argv[1]
sf = sys.argv[2]

spark = (
    SparkSession.builder.master("local[4, 2]")  # 2 attempts per task
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("retry-chaos")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).repartition(4, "vec_id")


def kernel(poison):
    # the engine's micro-integer partial pattern (ml_centroid pipeline,
    # PCA moments): per-batch integer sums, mergeable and exact
    def run(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if poison and ctx.partitionId() == 0:
            flag = os.path.join(marker_dir, f"attempt-{ctx.attemptNumber()}")
            open(flag, "w").close()
            if ctx.attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
        import numpy as np

        s = 0
        n = 0
        for pdf in batches:
            for e in pdf["embedding"]:
                s += int(np.round(np.array(e, dtype=np.float64) * 1e6).sum())
                n += 1
        yield pd.DataFrame({"s": [s], "n": [n]})

    return run


def total(poison):
    out = emb.mapInPandas(kernel(poison), "s long, n long").groupBy().sum("s", "n")
    row = out.collect()[0]
    return [row[0], row[1]]


clean = total(False)
chaos = total(True)
attempts = sorted(os.path.basename(p) for p in glob.glob(os.path.join(marker_dir, "attempt-*")))
print(json.dumps({"clean": clean, "chaos": chaos, "attempts": attempts}))
"""


def test_retried_task_contributes_identical_partial():
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "chaos.py")
        with open(script, "w") as f:
            f.write(_SCRIPT)
        res = subprocess.run(
            [sys.executable, script, td, "/root/testdata/sf0.001"],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=420,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        payload = json.loads(res.stdout.strip().splitlines()[-1])
        # the poisoned partition really failed once and was retried
        assert "attempt-0" in payload["attempts"]
        assert "attempt-1" in payload["attempts"]
        # and the retried run's result is bit-identical to the clean run
        assert payload["chaos"] == payload["clean"]
        assert payload["clean"][1] > 0  # non-trivial row count

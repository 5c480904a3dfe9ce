"""Stage annotation + timing spans.

Parity with the reference's NVTX ranges (NvtxRange.java:44-58, call
sites RapidsRowMatrix.scala:78,88,111,153,183,193): each span names
the Spark jobs it encloses (visible in the Spark UI / event logs via
setJobDescription) and records wall-clock, so the fit/transform
stages are attributable exactly like the reference's profiler ranges.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

from pyspark.sql import SparkSession

log = logging.getLogger("spark_rapids_ml_spark.profiling")

_TIMINGS: dict[str, float] = {}


@contextmanager
def span(spark: SparkSession, name: str):
    """Annotate enclosed Spark jobs with `name` and time the span."""
    sc = spark.sparkContext
    prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TIMINGS[name] = _TIMINGS.get(name, 0.0) + dt
        log.debug("span %s: %.3fs", name, dt)
        sc.setJobDescription(prev)


def timings() -> dict[str, float]:
    """Cumulative span timings for this process (reset with clear())."""
    return dict(_TIMINGS)


def clear() -> None:
    _TIMINGS.clear()

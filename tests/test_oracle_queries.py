"""Every declared query must match its DuckDB oracle (driver replica).

This is the same check the driver runs at sf0.01 — run here at
sf0.001 for speed (override with SPARK_GRAFT_TEST_SF_DIR).
"""

from __future__ import annotations

import pytest

from spark_rapids_ml_spark.harness import compare
from spark_rapids_ml_spark.registry import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    ok, details = compare(spark, spec, sf_dir)
    assert ok, f"{name}: {details}"

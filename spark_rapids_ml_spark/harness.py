"""Local replica of the driver's DuckDB-oracle correctness check.

For each declared query: run the Spark DataFrame and the oracle SQL
on the same parquet tables, then compare row count, column names, and
an order-insensitive value comparison (sorted by all columns). Used
by pytest so every operator is validated the same way the driver
validates it (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from spark_rapids_ml_spark.registry import QuerySpec
from spark_rapids_ml_spark.sources.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # Bound the oracle's memory so a heavy compare at large SF spills to
    # disk instead of tripping the machine OOM killer next to the Spark
    # JVM (observed at sf10: two concurrent sweeps OOM-killed the box).
    # The default is RAM-aware — min(40GB, 50% of physical memory) — so
    # on a small box it LOWERS DuckDB's own 80%-of-RAM default instead
    # of raising it. Overridable; no effect on results, only on spill.
    try:
        half_ram_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (2 * 1024**3)
        )
    except (ValueError, OSError, AttributeError):
        half_ram_gb = 40
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM", f"{max(1, min(40, half_ram_gb))}GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # Cap spill too: an unbounded spill at sf10 filled the root fs and
    # killed the sweep mid-catalog. Better one failed compare than a
    # wedged machine; the cap errors the offending oracle query only.
    tmp_cap = os.environ.get("SPARK_GRAFT_DUCKDB_TMP", "40GB")
    con.execute(f"SET max_temp_directory_size='{tmp_cap}'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values; stringify floats at 6dp."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].map(lambda v: "nan" if v is None or (isinstance(v, float) and math.isnan(v)) else f"{v:.6f}")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(
    spark: SparkSession, spec: QuerySpec, sf_dir: str
) -> tuple[bool, dict[str, Any]]:
    """Run spark query vs oracle; return (match, details)."""
    from spark_rapids_ml_spark.operators.dedup import release_caches

    sdf = spec.fn(spark, sf_dir).toPandas()
    release_caches()  # free any executor blocks the query pinned
    if spec.oracle is None:
        return len(sdf) >= 0, {"rows": len(sdf), "oracle": "none"}
    con = duckdb_connect(sf_dir)
    try:
        odf = con.execute(spec.oracle).df()
    finally:
        con.close()  # release spill files promptly between compares
    details: dict[str, Any] = {"spark_rows": len(sdf), "oracle_rows": len(odf)}
    if len(sdf) != len(odf):
        return False, {**details, "why": "row count"}
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, {
            **details,
            "why": "columns",
            "spark_cols": sorted(sdf.columns),
            "oracle_cols": sorted(odf.columns),
        }
    a, b = _normalize(sdf), _normalize(odf)
    eq = a.equals(b)
    if not eq:
        neq = (a != b).any(axis=1)
        details["why"] = "values"
        details["first_diff"] = {
            "spark": a[neq].head(3).to_dict("records"),
            "oracle": b[neq].head(3).to_dict("records"),
        }
    return eq, details

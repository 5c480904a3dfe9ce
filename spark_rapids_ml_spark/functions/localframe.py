"""Tiny driver-side literal DataFrames that plan as LocalTableScan.

``spark.createDataFrame(list_of_rows, schema)`` parallelizes the rows
into ``defaultParallelism`` slices and plans as ``Scan ExistingRDD`` —
so every consumer (a broadcast build, the bench's consume aggregate, a
join spine) launches a 32-task job to read a handful of literals.
Measured at sf0.1: 0.4-0.6 s of pure tiny-task scheduling per query
that ships a centroid table, bucket spine or trajectory frame this
way (guide §1/§5 — the driver should not schedule a cluster job to
move k rows it already holds).

Routing the same rows through a pandas DataFrame + the session's Arrow
conversion instead plans a ``LocalTableScan``: broadcasts materialize
driver-side with ZERO jobs, and scans of the frame are one task. The
declared schema is still enforced by createDataFrame, so column types
are unchanged — only the physical plan shape differs. Any payload the
Arrow conversion cannot coerce falls back to the plain path (Spark
itself also falls back internally), so this is never a correctness
risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that plans as
    LocalTableScan for small driver-resident row lists.

    ``rows``: list of tuples (or anything pandas accepts row-wise).
    ``schema``: DDL string or StructType — required, so the pandas hop
    can never change the declared column types.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    rows = list(rows)
    if isinstance(schema, StructType):
        names = schema.fieldNames()
    else:
        from pyspark.sql.types import _parse_datatype_string

        names = _parse_datatype_string(schema).fieldNames()
    try:
        pdf = pd.DataFrame.from_records(rows, columns=names).astype(object)
        # NaN (pandas' missing marker for numeric cells) must reach
        # Arrow as None or nullable ints round-trip as floats
        pdf = pdf.where(pdf.notna(), None)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:  # noqa: BLE001 — payload Arrow can't coerce
        return spark.createDataFrame(rows, schema)

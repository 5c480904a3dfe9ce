"""Input-schema validation + estimator-level persistence helpers.

Parity targets in the reference:
- ``validateAndTransformSchema`` (RapidsPCA.scala:127-129 via Spark's
  PCAParams → SchemaUtils.checkColumnType(VectorUDT)): reject a
  wrongly-typed input column BEFORE any job launches — the reference
  fails fast on schema; without this check we'd fail inside the first
  Arrow batch with an opaque worker traceback.
- ``DefaultParamsWriter/Readable`` (RapidsPCA.scala:134-140,
  RapidsPCAModel reader/writer :207-255; round-tripped by
  PCASuite.scala:192-206): estimators persist their *params* as JSON
  metadata; models additionally persist data. Here: metadata.json with
  a class tag + params dict, symmetric classmethod load().
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

_NUMERIC = (DoubleType, FloatType, LongType, IntegerType, ShortType, ByteType)


def _is_vector_like(dt) -> bool:
    if isinstance(dt, ArrayType) and isinstance(dt.elementType, _NUMERIC):
        return True
    # ml.linalg VectorUDT without importing the UDT class directly
    return type(dt).__name__ == "VectorUDT"


def validate_vector_col(schema: StructType, input_col: str) -> None:
    """Fail fast (driver-side, zero jobs) unless ``input_col`` exists
    and is array<numeric> or an ml VectorUDT."""
    if input_col not in schema.names:
        raise ValueError(
            f"input column '{input_col}' not found; columns: {schema.names}"
        )
    dt = schema[input_col].dataType
    if not _is_vector_like(dt):
        raise ValueError(
            f"input column '{input_col}' must be array<numeric> or Vector, "
            f"got {dt.simpleString()}"
        )


def validate_numeric_col(schema: StructType, col: str) -> None:
    if col not in schema.names:
        raise ValueError(f"column '{col}' not found; columns: {schema.names}")
    dt = schema[col].dataType
    if not isinstance(dt, _NUMERIC) and type(dt).__name__ != "DecimalType":
        raise ValueError(
            f"column '{col}' must be numeric, got {dt.simpleString()}"
        )


def transform_schema(
    schema: StructType, input_col: str, output_col: str
) -> StructType:
    """The transformSchema contract (RapidsPCA.scala:127-129,193-200):
    validate the input column, reject an already-present output column,
    and return the post-transform schema."""
    validate_vector_col(schema, input_col)
    if output_col in schema.names:
        raise ValueError(f"output column '{output_col}' already exists")
    return StructType(
        schema.fields + [StructField(output_col, ArrayType(DoubleType()))]
    )


# ---------------- estimator params persistence ----------------


def save_params(path: str, clazz: str, params: dict) -> None:
    """DefaultParamsWriter parity: metadata.json carrying the class tag
    and the param map (plain JSON — estimators hold no fitted data)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump({"class": clazz, "params": params}, f)


def load_params(path: str, clazz: str) -> dict:
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    if meta.get("class") != clazz:
        raise ValueError(f"expected {clazz}, found {meta.get('class')}")
    return meta["params"]

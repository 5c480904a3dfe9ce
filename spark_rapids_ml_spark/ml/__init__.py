"""Core estimators (see spark_rapids_ml_spark.feature for the
reference-parity public import path over the Pipeline facades).

Submodules import lazily on attribute access so `import
spark_rapids_ml_spark.ml` stays cheap for callers that only want one
estimator (pipeline_api pulls in pyspark.ml machinery).
"""

from __future__ import annotations

import importlib

_SUBMODULES = {"pca", "kmeans", "linreg", "scaler", "pipeline_api", "schema"}


def __getattr__(name: str):
    if name in _SUBMODULES:
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(_SUBMODULES)

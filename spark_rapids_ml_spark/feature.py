"""Public import-path parity with the reference.

The reference's user-facing entry point is
``com.nvidia.spark.ml.feature.PCA`` (PCA.scala:27-37) — a thin public
subclass over the real estimator (RapidsPCA.scala) so user code reads
``new PCA().setInputCol(...).fit(df)`` against a ``feature`` package.
This module gives the switching user the same spelling:

    from spark_rapids_ml_spark.feature import PCA, PCAModel

    model = PCA(k=3, inputCol="features").fit(df)

``PCA`` here is the Pipeline-composable estimator (ml/pipeline_api.py)
— proper ``Param``s, ``copy()``, DefaultParams persistence — exactly
the contract the reference's class inherits from Spark ML.
"""

from __future__ import annotations

from spark_rapids_ml_spark.ml.pipeline_api import (
    SparkKMeans as KMeans,
    SparkKMeansModel as KMeansModel,
    SparkPCA as PCA,
    SparkPCAModel as PCAModel,
    SparkStandardScaler as StandardScaler,
    SparkStandardScalerModel as StandardScalerModel,
)

__all__ = [
    "PCA",
    "PCAModel",
    "KMeans",
    "KMeansModel",
    "StandardScaler",
    "StandardScalerModel",
]

"""pyspark.ml-compatible facade over the core PCA implementation.

The reference exposes its estimator through Spark ML's Pipeline API —
``com.nvidia.spark.ml.feature.PCA`` is a thin public subclass
(PCA.scala:27-37) of the real estimator (RapidsPCA.scala), with the
standard Params surface (inputCol/outputCol/k, RapidsPCA.scala:30-75).
This module provides the same shape for PySpark: ``SparkPCA`` is a
``pyspark.ml.Estimator`` with proper ``Param``s that delegates to
spark_rapids_ml_spark.ml.pca, so it composes inside
``pyspark.ml.Pipeline`` next to stock stages.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasInputCol, HasOutputCol

from spark_rapids_ml_spark.ml.pca import PCA as CorePCA
from spark_rapids_ml_spark.ml.pca import PCAModel as CorePCAModel


class _PCAParams(HasInputCol, HasOutputCol):
    """Param surface mirroring RapidsPCA.scala:30-75 (k, inputCol,
    outputCol, meanCentering; the GPU-routing params collapse into the
    numpy backend — see ml/pca.py)."""

    k = Param(
        Params._dummy(),
        "k",
        "number of principal components",
        typeConverter=TypeConverters.toInt,
    )
    meanCentering = Param(
        Params._dummy(),
        "meanCentering",
        "whether to center the data before computing the covariance",
        typeConverter=TypeConverters.toBoolean,
    )

    def getK(self) -> int:
        return self.getOrDefault(self.k)

    def getMeanCentering(self) -> bool:
        return self.getOrDefault(self.meanCentering)


class SparkPCA(Estimator, _PCAParams):
    """Pipeline-composable PCA estimator (public API parity with
    com.nvidia.spark.ml.feature.PCA, PCA.scala:27-37)."""

    @keyword_only
    def __init__(self, *, k=2, inputCol="features", outputCol="pca_features", meanCentering=True):
        super().__init__()
        self._setDefault(k=2, meanCentering=True)
        self._set(
            k=k, inputCol=inputCol, outputCol=outputCol, meanCentering=meanCentering
        )

    @keyword_only
    def setParams(self, *, k=None, inputCol=None, outputCol=None, meanCentering=None):
        kwargs = {k_: v for k_, v in self._input_kwargs.items() if v is not None}
        return self._set(**kwargs)

    def setK(self, value: int) -> "SparkPCA":
        return self._set(k=value)

    def setInputCol(self, value: str) -> "SparkPCA":
        return self._set(inputCol=value)

    def setOutputCol(self, value: str) -> "SparkPCA":
        return self._set(outputCol=value)

    def _fit(self, dataset) -> "SparkPCAModel":
        core = CorePCA(
            k=self.getK(),
            input_col=self.getInputCol(),
            output_col=self.getOutputCol(),
            mean_centering=self.getMeanCentering(),
        ).fit(dataset)
        model = SparkPCAModel(core)
        model._resetUid(self.uid)
        return self._copyValues(model)


class SparkPCAModel(Model, _PCAParams):
    """Fitted Pipeline-composable model wrapping the core PCAModel."""

    def __init__(self, core: CorePCAModel | None = None):
        super().__init__()
        self._core = core

    @property
    def pc(self):
        return self._core.pc

    @property
    def explainedVariance(self):
        return self._core.explained_variance_ratio

    def _transform(self, dataset):
        return self._core.transform(dataset)

    def save_model(self, spark, path: str) -> None:
        self._core.save(spark, path)

    @classmethod
    def load_model(cls, spark, path: str) -> "SparkPCAModel":
        return cls(CorePCAModel.load(spark, path))

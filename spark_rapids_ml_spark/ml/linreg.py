"""Distributed linear regression via normal equations.

Reuses the engine's Gram-partial machinery (ml/pca.py): one linear
scan gathers (n, Σz, ΣzzᵀT) for z = [x | y]; the driver then solves
(XᵀX)β = Xᵀy — both blocks are sub-matrices of the z-Gram. Same scale
property as PCA fit: shuffle O(n_features²) per partition, driver
memory O(n_features²), row count irrelevant.

This is the classic scalable closed-form fit (the shape GPU ML
libraries accelerate); for n_features beyond ~10⁴ one would switch to
L-BFGS/SGD — out of scope for the declared contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from spark_rapids_ml_spark.ml.pca import _partials, _sum_partials


class LinearRegression:
    """fit(df, feature_col=array<numeric>, label_col=numeric) → model
    with .coefficients (per feature) and .intercept."""

    def __init__(self, feature_col: str = "features", label_col: str = "label", fit_intercept: bool = True):
        self.feature_col = feature_col
        self.label_col = label_col
        self.fit_intercept = fit_intercept

    # -------- estimator persistence (params-only metadata, mirrors
    # DefaultParamsWriter; see ml/schema.py) --------

    _CLASS = "spark_rapids_ml_spark.ml.linreg.LinearRegression"

    def save(self, path: str) -> None:
        from spark_rapids_ml_spark.ml.schema import save_params

        save_params(
            path,
            self._CLASS,
            {
                "feature_col": self.feature_col,
                "label_col": self.label_col,
                "fit_intercept": self.fit_intercept,
            },
        )

    @classmethod
    def load(cls, path: str) -> "LinearRegression":
        from spark_rapids_ml_spark.ml.schema import load_params

        return cls(**load_params(path, cls._CLASS))

    def fit(self, df: DataFrame) -> "LinearRegressionModel":
        from pyspark.sql import functions as F

        from spark_rapids_ml_spark.ml.schema import (
            validate_numeric_col,
            validate_vector_col,
        )

        validate_vector_col(df.schema, self.feature_col)  # fail fast, zero jobs
        validate_numeric_col(df.schema, self.label_col)
        z = df.select(
            F.concat(
                F.col(self.feature_col).cast("array<double>"),
                F.array(F.col(self.label_col).cast("double")),
            ).alias("z")
        )
        first = z.first()
        d = len(first[0]) - 1  # features
        n, colsum, gram = _sum_partials(_partials(z, "z"), d + 1)
        sx = colsum[:d]
        sy = colsum[d]
        gxx = gram[:d, :d]
        gxy = gram[:d, d]
        if self.fit_intercept:
            # centered normal equations: (Gxx - n·x̄x̄ᵀ)β = Gxy - n·x̄·ȳ
            xm = sx / n
            ym = sy / n
            a = gxx - n * np.outer(xm, xm)
            b = gxy - n * xm * ym
            beta = np.linalg.solve(a, b)
            intercept = float(ym - xm @ beta)
        else:
            beta = np.linalg.solve(gxx, gxy)
            intercept = 0.0
        return LinearRegressionModel(beta, intercept, self.feature_col, n_rows=n)


class LinearRegressionModel:
    def __init__(
        self,
        coefficients: np.ndarray,
        intercept: float,
        feature_col: str,
        n_rows: int | None = None,
    ):
        # n_rows comes free from the fit partials — consumers must not
        # pay a second full scan just to count (mirrors PCAModel.n_rows)
        self.n_rows = n_rows
        self.coefficients = coefficients
        self.intercept = intercept
        self.feature_col = feature_col

    def save(self, spark, path: str) -> None:
        """Persistence layout mirrors PCAModel (metadata.json + data/)."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "class": "spark_rapids_ml_spark.ml.linreg.LinearRegressionModel",
                    "feature_col": self.feature_col,
                    "intercept": self.intercept,
                },
                f,
            )
        spark.createDataFrame(
            [{"coefficients": self.coefficients.tolist()}]
        ).repartition(1).write.mode("overwrite").parquet(os.path.join(path, "data"))

    @classmethod
    def load(cls, spark, path: str) -> "LinearRegressionModel":
        import json
        import os

        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        row = spark.read.parquet(os.path.join(path, "data")).head()
        return cls(np.array(row["coefficients"]), meta["intercept"], meta["feature_col"])

    def transform(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql.types import DoubleType

        beta = self.coefficients.copy()
        b0 = self.intercept

        @F.pandas_udf(DoubleType())
        def predict(series: pd.Series) -> pd.Series:
            x = np.vstack(series.map(lambda v: np.asarray(v, dtype=np.float64)).to_numpy())
            return pd.Series(x @ beta + b0)

        return df.withColumn(output_col, predict(F.col(self.feature_col)))

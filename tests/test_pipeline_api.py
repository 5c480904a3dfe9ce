"""Pipeline-API facade tests: the estimator must compose inside
pyspark.ml.Pipeline (the reference's public API shape, PCA.scala:27-37)
and agree with the core implementation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml import Pipeline
from pyspark.ml.param import Params

from spark_rapids_ml_spark.ml.pipeline_api import SparkPCA, SparkPCAModel


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 12))
    return x, spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], ["id", "features"]
    )


def test_params_roundtrip():
    est = SparkPCA(k=3, inputCol="f", outputCol="o", meanCentering=False)
    assert est.getK() == 3
    assert est.getInputCol() == "f"
    assert est.getOutputCol() == "o"
    assert est.getMeanCentering() is False
    est.setK(5).setInputCol("g")
    assert est.getK() == 5 and est.getInputCol() == "g"
    # copy() must preserve params (ParamsSuite.checkParams parity)
    c = est.copy()
    assert isinstance(c, Params) and c.getK() == 5


def test_fit_in_pipeline(spark, vec_df):
    x, df = vec_df
    pipe = Pipeline(stages=[SparkPCA(k=4, inputCol="features", outputCol="proj")])
    pmodel = pipe.fit(df)
    out = pmodel.transform(df)
    assert out.columns == ["id", "features", "proj"]
    rows = out.select("id", "proj").collect()
    assert len(rows) == 200 and len(rows[0]["proj"]) == 4
    stage = pmodel.stages[0]
    assert isinstance(stage, SparkPCAModel)
    assert stage.pc.shape == (12, 4)
    # projection parity with direct numpy computation
    got = {r["id"]: np.array(r["proj"]) for r in rows}
    expected = x @ stage.pc
    for i in (0, 57, 199):
        np.testing.assert_allclose(got[i], expected[i], atol=1e-5)


def test_model_persistence_via_facade(spark, vec_df, tmp_path):
    _x, df = vec_df
    model = SparkPCA(k=2, inputCol="features").fit(df)
    path = str(tmp_path / "facade_model")
    model.save_model(spark, path)
    loaded = SparkPCAModel.load_model(spark, path)
    np.testing.assert_array_equal(model.pc, loaded.pc)

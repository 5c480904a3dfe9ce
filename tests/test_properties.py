"""Property-based and portability tests.

- hypothesis invariants for the driver-side linear algebra (sign
  convention, eigen ordering, covariance identity) — pure numpy, fast;
- a cross-engine sweep proving hash60 (the portable MinHash/SimHash
  base hash) is bit-identical between Spark and DuckDB on adversarial
  strings;
- a hypothesis check that salted two-phase aggregation is semantically
  identical to direct aggregation on arbitrary key/value multisets.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_rapids_ml_spark.functions.portable import hash60, sql_hash60
from spark_rapids_ml_spark.ml.pca import sign_flip


@given(
    st.integers(2, 8),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_eigh_pipeline_invariants(n, seed):
    """For any random symmetric PSD matrix: descending eigenvalues,
    orthonormal flipped vectors, max-|x| element positive, and the
    eigendecomposition reconstructs the matrix."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n + 3, n))
    cov = a.T @ a / (len(a) - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals = vals[order]
    vecs = sign_flip(vecs[:, order])
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(n - 1))
    np.testing.assert_allclose(vecs.T @ vecs, np.eye(n), atol=1e-9)
    for j in range(n):
        i = int(np.argmax(np.abs(vecs[:, j])))
        assert vecs[i, j] >= 0
    np.testing.assert_allclose(vecs @ np.diag(vals) @ vecs.T, cov, atol=1e-9)


def test_sign_flip_idempotent_and_involutive():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(6, 4))
    f = sign_flip(m)
    np.testing.assert_array_equal(sign_flip(f), f)  # idempotent
    np.testing.assert_array_equal(sign_flip(-m), f)  # sign-invariant


ADVERSARIAL = [
    "",
    " ",
    "a",
    "0",
    "the quick brown fox",
    "ünïcödé tøkens",
    "tab\there",
    "quote'quote",
    'double"quote',
    "percent%like_",
    "back\\slash",
    "null\x01byte-ish",
    "x" * 500,
]


def test_hash60_cross_engine_identical(spark):
    """hash60 must agree with its SQL twin on adversarial strings and
    200 random tokens — the foundation of every portable-hash operator."""
    rng = np.random.default_rng(42)
    words = ["".join(rng.choice(list("abcdefghij0123456789"), size=rng.integers(1, 20))) for _ in range(200)]
    values = ADVERSARIAL + words
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    got = {
        r["s"]: (r["h"], r["hs"])
        for r in df.select(
            "s", hash60("s").alias("h"), hash60("s", seed=7).alias("hs")
        ).collect()
    }
    con = duckdb.connect()
    for v in values:
        h, hs = con.execute(
            f"SELECT {sql_hash60('?')}, {sql_hash60('?', seed=7)}".replace("?", "$tok"),
            {"tok": v},
        ).fetchone()
        assert got[v] == (h, hs), f"hash mismatch for {v!r}"


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_salted_agg_equals_direct(spark, pairs):
    """Salted two-phase aggregation == direct aggregation for any
    key/value multiset (exactness of the commutative merge)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(pairs)], ["k", "v", "rid"]
    )
    direct = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.col("rid"), F.lit(4)))
        .groupBy("k", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps"), F.max("v").alias("pm"))
        .groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"), F.max("pm").alias("mx"))
    )
    got = {r["k"]: (r["n"], r["s"], r["mx"]) for r in salted.collect()}
    assert got == direct

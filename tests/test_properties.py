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
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_property(w, h, seed):
    """decode(encode(img)) == img for ANY image dimensions — the
    codec pair is lossless by construction."""
    from spark_rapids_ml_spark.functions.codecs import decode_ppm, encode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


@given(st.integers(0, 5000), st.integers(0, 2**32 - 1), st.sampled_from([8, 16]))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, seed, bits):
    """WAV encode→decode recovers every sample (centered for 8-bit)
    at ANY length, including the empty signal."""
    from spark_rapids_ml_spark.functions.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    if bits == 8:
        s = rng.integers(0, 256, size=n, dtype=np.uint8)
        expect = s.astype(np.float64) - 128.0
    else:
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        expect = s.astype(np.float64)
    x, sr = decode_wav(encode_wav(s, 8000, bits=bits))
    assert sr == 8000
    np.testing.assert_array_equal(x, expect)


@given(
    st.lists(st.integers(1, 200), min_size=1, max_size=12),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_lsh_guard_components_invariant_property(sizes, seed):
    """For ANY bucket-size layout, the capped candidate graph has
    exactly the same connected components as the uncapped one, and its
    edge count never exceeds sum(min(size, cap) * size) — the pure
    graph-side invariant behind the Spark guard (the distributed
    implementation is pinned against this logic in test_quality.py)."""
    cap = 64

    def edges(layout, capped):
        out = []
        doc = 0
        for size in layout:
            ids = list(range(doc, doc + size))
            doc += size
            if capped and size > cap:
                out += [(ids[0], d) for d in ids[1:]]
            else:
                out += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return out, doc

    capped, n = edges(sizes, True)
    uncapped, _ = edges(sizes, False)

    def comp(pairs):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return [find(d) for d in range(n)]

    ca, cu = comp(capped), comp(uncapped)
    groups_a = {}
    groups_u = {}
    for d in range(n):
        groups_a.setdefault(ca[d], set()).add(d)
        groups_u.setdefault(cu[d], set()).add(d)
    assert {frozenset(g) for g in groups_a.values()} == {
        frozenset(g) for g in groups_u.values()
    }
    assert len(capped) <= sum(min(s, cap) * s for s in sizes)


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

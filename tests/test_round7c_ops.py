"""Semantic pins for the third round-7 operator wave, beyond the hash
oracle: sparse-cosine bounds + planted-pair recall, exact-substring
span coverage vs a brute-force Python recomputation, histogram split
gain vs a numpy recomputation, and link-prediction non-edge + range
invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_rapids_ml_spark import ml_queries as mlq
from spark_rapids_ml_spark.operators import dedup as dd
from spark_rapids_ml_spark.operators import graph as g
from spark_rapids_ml_spark.operators import similarity as sim
from spark_rapids_ml_spark.sources.catalog import load

SF = "/root/testdata/sf0.001"


def test_sparse_cosine_bounds_and_planted_recall(spark):
    rows = sim.sim_sparse_tfidf_cosine_pairs(spark, SF).collect()
    assert rows, "planted near-dup pairs must surface"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert sim.SPARSE_COS_THRESHOLD <= r.cosine <= 1.0 + 1e-9
    # idf-weighted cosine must find the same planted structure the
    # exact-substring detector flags: every cosine pair's docs carry
    # duplicated spans
    span_docs = {
        r.doc_id for r in dd.dedup_exact_substring_spans(spark, SF).collect()
    }
    for r in rows:
        assert r.doc_a in span_docs and r.doc_b in span_docs


def test_substring_spans_match_bruteforce(spark):
    W = dd.SUBSTR_WINDOW
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    cap = dd._doc_slice_cap(len(docs))
    wins: dict[tuple, set] = {}
    toks_by_doc = {}
    for r in docs:
        if r.doc_id > cap:
            continue
        toks = r.text.split(" ")
        if len(toks) < W:
            continue
        toks_by_doc[r.doc_id] = toks
        for i in range(len(toks) - W + 1):
            wins.setdefault(tuple(toks[i : i + W]), set()).add(r.doc_id)
    dup_windows = {w for w, ds in wins.items() if len(ds) >= 2}
    expect = {}
    for doc_id, toks in toks_by_doc.items():
        covered: set[int] = set()
        n_dup = 0
        for i in range(len(toks) - W + 1):
            if tuple(toks[i : i + W]) in dup_windows:
                n_dup += 1
                covered.update(range(i, i + W))
        if n_dup:
            expect[doc_id] = (len(toks), n_dup, len(covered))
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_windows, r.covered_tokens)
        for r in dd.dedup_exact_substring_spans(spark, SF).collect()
    }
    assert got == expect


def test_tree_split_gain_matches_numpy(spark):
    rows = {r.dim: r for r in mlq.ml_tree_split_histogram(spark, SF).collect()}
    assert set(rows) == set(range(1, 65))
    e = load(spark, SF, "embeddings").select("embedding", "label").collect()
    X = np.array([r.embedding for r in e], dtype=np.float64)
    y = np.array([r.label for r in e], dtype=np.int64)
    B = mlq.TREE_N_BINS
    for dim in (1, 17, 64):  # spot-check three dims exhaustively
        v = X[:, dim - 1]
        mn, mx = v.min(), v.max()
        bins = (
            np.zeros(len(v), dtype=np.int64)
            if mx == mn
            else np.minimum(np.floor((v - mn) / (mx - mn) * B), B - 1).astype(np.int64)
        )
        n, s = len(y), int(y.sum())
        best = None
        for t in sorted(set(bins)):
            m = bins <= t
            nl, sl = int(m.sum()), int(y[m].sum())
            if nl == 0 or nl == n:
                continue
            gain = sl * sl / nl + (s - sl) ** 2 / (n - nl) - s * s / n
            if best is None or gain > best[1] + 1e-12:
                best = (t, gain, nl)
        r = rows[dim]
        assert r.split_bin == best[0]
        assert r.n_left == best[2] and r.n_right == len(y) - best[2]
        assert abs(r.gain - best[1]) < 1e-5
        assert r.gain >= 0


def test_link_prediction_candidates_are_nonedges(spark):
    rows = g.graph_link_prediction_jaccard(spark, SF).collect()
    assert rows
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    prev = None
    for r in rows:
        assert r.a < r.b
        assert (r.a, r.b) not in edges, "predicted pair must be a NON-edge"
        assert r.n_common >= g.LP_MIN_COMMON
        assert 0 < r.jaccard <= 1
        assert r.n_common <= min(r.deg_a, r.deg_b)
        if prev is not None:  # ranking is descending
            assert r.jaccard <= prev + 1e-9
        prev = r.jaccard

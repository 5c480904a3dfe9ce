"""Semantic pins for round-7 changes beyond the hash oracle: the DP
release-nonce contract and the adaptive PQ shortlist arithmetic."""

from __future__ import annotations

from spark_rapids_ml_spark.operators import aggregates as agg
from spark_rapids_ml_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_dp_nonce_rotates_noise_and_preserves_counts(spark, monkeypatch):
    """Same nonce -> bit-identical release (reproducibility); rotated
    nonce -> different noise draws on the same true counts (the
    per-release re-randomization the nonce exists for)."""
    base = {r.event_type: r for r in agg.dq_dp_noisy_counts(spark, SF).collect()}
    again = {r.event_type: r for r in agg.dq_dp_noisy_counts(spark, SF).collect()}
    assert {k: v.noisy_n for k, v in base.items()} == {
        k: v.noisy_n for k, v in again.items()
    }

    monkeypatch.setattr(agg, "DP_NONCE", "release-rotated")
    rotated = {r.event_type: r for r in agg.dq_dp_noisy_counts(spark, SF).collect()}
    # true counts unchanged, noise re-drawn
    assert {k: v.n for k, v in base.items()} == {k: v.n for k, v in rotated.items()}
    assert any(base[k].noisy_n != rotated[k].noisy_n for k in base)


def test_dp_noise_bounded_and_centered(spark):
    """Laplace(b=2) inverse-CDF noise: |noisy - true| must stay within
    the distribution's practical envelope for the clamped uniform
    (|u| <= 0.5 - 1/2^60 -> |noise| <= b * ln(2^60) ~ 83)."""
    rows = agg.dq_dp_noisy_counts(spark, SF).collect()
    for r in rows:
        assert abs(r.noisy_n - r.n) <= agg.DP_SCALE * 60 * 0.6931 + 1e-6


def test_pq_shortlist_scales_with_corpus():
    """The ADC shortlist is max(floor, N // div): the floor binds at
    test scales (bit-stable history), the fraction binds at 10x+."""
    floor, div = sim.PQ_CAND, sim.PQ_CAND_DIV
    assert max(floor, 200 // div) == floor       # sf0.01
    assert max(floor, 2000 // div) == floor      # sf0.1
    assert max(floor, 20000 // div) == 1000      # sf1: 5% of corpus
    assert max(floor, 200000 // div) == 10000    # sf10


def test_emb_lsh_resolution_ladder_bit_stable():
    """Extending the plane ladder (7 -> 9 planes for the >160k rung)
    must not reshuffle the first 7 planes per table: they come from the
    original seed and draw shape, the new rung from a separate seed —
    otherwise every bucket id at sf0.1..sf1 would silently change."""
    import numpy as np

    from spark_rapids_ml_spark.operators import dedup as dd

    planes = dd._emb_extra_hyperplanes()
    assert planes.shape == (sim.N_TABLES, dd.EMB_EXTRA_PLANES, sim.DIM)
    legacy = np.random.default_rng(sim.LSH_SEED + 7).choice(
        [-1.0, 1.0], size=(sim.N_TABLES, 7, sim.DIM)
    )
    assert np.array_equal(planes[:, :7, :], legacy)


def test_emb_lsh_rung3_gates_on_corpus_size(spark):
    """Bits 11-12 fire only above EMB_RES_THRESH_3 (sf10 regime), so
    every scale through sf1 keeps its historical bucket ids."""
    from spark_rapids_ml_spark.operators import dedup as dd

    below = str(dd._emb_bucket_ext_expr("embedding", 0, dd.EMB_RES_THRESH_3))
    above = str(dd._emb_bucket_ext_expr("embedding", 0, dd.EMB_RES_THRESH_3 + 1))
    assert str(1 << 11) not in below and str(1 << 12) not in below
    assert str(1 << 11) in above and str(1 << 12) in above
    # the oracle ladder carries the same third rung
    assert f"> {dd.EMB_RES_THRESH_3}" in dd._sql_emb_bucket_ext("emb", 0)


def test_exact_tier_cap_ceil_matches_duckdb():
    """Python's -(-n // CAP) and the oracle's CEIL(n / CAP.0) must pick
    the same modulus at every corpus size, else the two engines score
    different subsamples."""
    import math

    from spark_rapids_ml_spark.operators import dedup as dd

    cap = dd.EXACT_TIER_MAX
    for n in (1, cap - 1, cap, cap + 1, 2 * cap, 228_572, 10**9):
        assert -(-n // cap) == math.ceil(n / float(cap))

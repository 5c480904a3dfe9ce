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

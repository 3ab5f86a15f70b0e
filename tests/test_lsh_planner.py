"""LSH planner: closed-form S-curve vs the engine's real signatures.

The planner (functions/lsh_planner.py) is only trustworthy if its
collision model matches what operators/lsh.py actually computes — these
tests pin the two together by Monte-Carlo over the SAME ``hyperplanes``
matrix the operator uses, plus property tests on the grid search."""

from __future__ import annotations

import numpy as np
import pytest

from deepblocker_spark.functions.lsh_planner import (
    LSHPlan,
    band_agreement_probability,
    collision_probability,
    plan_lsh,
)
from deepblocker_spark.operators.lsh import hyperplanes


def _pairs_at_similarity(n: int, dim: int, sim: float, seed: int) -> tuple:
    """n unit-vector pairs with EXACT cosine similarity ``sim`` each:
    v = sim*u + sqrt(1-sim^2)*w with w a unit vector orthogonal to u."""
    rng = np.random.Generator(np.random.PCG64(seed))
    u = rng.standard_normal((n, dim))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.standard_normal((n, dim))
    w -= (w * u).sum(axis=1, keepdims=True) * u  # project out u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    v = sim * u + np.sqrt(1.0 - sim * sim) * w
    return u, v


def _empirical_collision(u, v, dim, n_bands, band_bits, seed) -> float:
    """Fraction of (u_i, v_i) pairs sharing >=1 band bucket under the
    operator's own hyperplane matrix and band layout."""
    planes = hyperplanes(dim, n_bands, band_bits, seed)
    bu = (u @ planes.T) > 0
    bv = (v @ planes.T) > 0
    hit = np.zeros(len(u), dtype=bool)
    for b in range(n_bands):
        sl = slice(b * band_bits, (b + 1) * band_bits)
        hit |= (bu[:, sl] == bv[:, sl]).all(axis=1)
    return float(hit.mean())


@pytest.mark.parametrize("sim", [0.5, 0.8, 0.95])
def test_closed_form_matches_engine_signatures(sim):
    n, dim, n_bands, band_bits = 6000, 64, 8, 6
    u, v = _pairs_at_similarity(n, dim, sim, seed=7)
    emp = _empirical_collision(u, v, dim, n_bands, band_bits, seed=1234)
    pred = collision_probability(sim, n_bands, band_bits)
    # n=6000 Bernoulli trials: 4 sigma < 0.026 at worst-case p=0.5
    assert abs(emp - pred) < 0.03, (sim, emp, pred)


def test_band_agreement_endpoints():
    assert band_agreement_probability(1.0, 10) == pytest.approx(1.0)
    assert band_agreement_probability(-1.0, 1) == pytest.approx(0.0)
    # orthogonal vectors agree per-bit with probability exactly 1/2
    assert band_agreement_probability(0.0, 1) == pytest.approx(0.5)


def test_collision_probability_monotone():
    sims = np.linspace(-0.9, 0.99, 40)
    probs = [collision_probability(s, 8, 12) for s in sims]
    assert all(b >= a for a, b in zip(probs, probs[1:]))
    # more bands never hurt recall; more bits never help it
    assert collision_probability(0.8, 16, 12) >= collision_probability(0.8, 8, 12)
    assert collision_probability(0.8, 8, 16) <= collision_probability(0.8, 8, 12)


def test_plan_meets_constraints():
    plan = plan_lsh(sim_target=0.9, recall_target=0.97,
                    sim_noise=0.3, max_noise_prob=0.05)
    assert isinstance(plan, LSHPlan)
    assert plan.recall_at_target >= 0.97
    assert plan.noise_at_floor is not None and plan.noise_at_floor <= 0.05
    # the plan's own S-curve agrees with the module functions
    assert plan.collision_probability(0.9) == pytest.approx(plan.recall_at_target)


def test_plan_is_cheapest_feasible():
    """No feasible configuration with fewer bands exists, and none with
    the same bands but more bits — brute-forced over the whole grid."""
    target, recall, noise_s, noise_p = 0.85, 0.95, 0.2, 0.02
    plan = plan_lsh(target, recall, noise_s, noise_p)

    def feasible(nb, bb):
        return (collision_probability(target, nb, bb) >= recall
                and collision_probability(noise_s, nb, bb) <= noise_p)

    assert feasible(plan.n_bands, plan.band_bits)
    for nb in range(1, plan.n_bands):
        assert not any(feasible(nb, bb) for bb in range(1, 25)), nb
    for bb in range(plan.band_bits + 1, 25):
        assert not feasible(plan.n_bands, bb)


def test_plan_infeasible_raises():
    # a near-step S-curve separating 0.80 from 0.79 at these ceilings
    # cannot exist in a 64x24 grid
    with pytest.raises(ValueError):
        plan_lsh(0.80, 0.999, sim_noise=0.79, max_noise_prob=0.001)
    with pytest.raises(ValueError):
        plan_lsh(0.9, 1.5)
    with pytest.raises(ValueError):
        plan_lsh(0.5, 0.9, sim_noise=0.6)


def test_config_with_planned_lsh():
    from deepblocker_spark.config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG.with_planned_lsh(0.9, 0.97, sim_noise=0.3)
    assert collision_probability(0.9, cfg.lsh_n_bands, cfg.lsh_band_bits) >= 0.97
    assert collision_probability(0.3, cfg.lsh_n_bands, cfg.lsh_band_bits) <= 0.05
    # everything else untouched
    assert cfg.emb_dim == DEFAULT_CONFIG.emb_dim
    assert cfg.top_k == DEFAULT_CONFIG.top_k


def test_default_config_parameters_are_sane():
    """The engine's shipped defaults (config.py: 8 bands x 12 bits) sit
    on a sensible part of the curve: high recall for near-duplicates,
    vanishing collision rate for unrelated vectors."""
    assert collision_probability(0.95, 8, 12) > 0.9
    assert collision_probability(0.1, 8, 12) < 0.01

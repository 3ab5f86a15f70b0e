"""LSH parameter planner: choose (n_bands, band_bits) from the S-curve.

SURVEY.md §7.4 watch item 1 says LSH parameters "need a recall@K harness
against the exact oracle"; the harness exists (tests + bench measure
recall vs operators/topk.py), but picking the parameters was still
manual. This module closes the loop with the closed-form collision
model for the engine's random-hyperplane signatures (operators/lsh.py
``hyperplanes``/``signature_buckets``):

  p(s)        = 1 - arccos(s)/pi          per-hyperplane agreement for a
                                          pair at cosine similarity s
                                          (Goemans-Williamson / SimHash)
  P_band(s)   = p(s)^band_bits            all bits in one band agree
  P_cand(s)   = 1 - (1 - P_band(s))^n_bands   pair collides in >=1 band

``plan_lsh`` searches the small integer grid for the cheapest
configuration whose S-curve clears a target recall at the similarity
that matters and (optionally) stays below a noise ceiling at a
dissimilar level. Cost model matches the engine's actual work:

  * every band replicates each signature row once — the kernel-exchange
    bytes (the measured scaling bottleneck, BASELINE.md protocol v5)
    grow LINEARLY in n_bands, so fewer bands are strictly cheaper;
  * at equal n_bands, MORE bits are cheaper: bucket occupancy drops
    geometrically, shrinking every per-bucket cross-product.

The closed form is validated against the engine's real signature
implementation by Monte-Carlo in tests/test_lsh_planner.py, so the
planner and the operator cannot drift apart silently.

No reference counterpart: /root/reference hardcodes exact O(N^2) pairing
(vector_pairing_models.py:36-49); band planning only exists here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def band_agreement_probability(sim: float, band_bits: int) -> float:
    """P(one band of ``band_bits`` hyperplane signs agrees) for a pair at
    cosine similarity ``sim``. ``sim`` is clamped to [-1, 1] to absorb
    float drift from callers that compute similarities numerically."""
    s = max(-1.0, min(1.0, float(sim)))
    p = 1.0 - math.acos(s) / math.pi
    return p**band_bits


def collision_probability(sim: float, n_bands: int, band_bits: int) -> float:
    """P(a pair at cosine similarity ``sim`` becomes a candidate) — i.e.
    collides in at least one of ``n_bands`` bands of ``band_bits`` bits."""
    pb = band_agreement_probability(sim, band_bits)
    return 1.0 - (1.0 - pb) ** n_bands


@dataclass(frozen=True)
class LSHPlan:
    n_bands: int
    band_bits: int
    recall_at_target: float  # P_cand at sim_target (>= recall_target)
    noise_at_floor: float | None  # P_cand at sim_noise (None if unconstrained)

    def collision_probability(self, sim: float) -> float:
        return collision_probability(sim, self.n_bands, self.band_bits)


def plan_lsh(
    sim_target: float,
    recall_target: float = 0.95,
    sim_noise: float | None = None,
    max_noise_prob: float = 0.05,
    max_bands: int = 64,
    max_bits: int = 24,
) -> LSHPlan:
    """Cheapest (n_bands, band_bits) whose S-curve reaches
    ``recall_target`` collision probability for pairs at ``sim_target``,
    optionally keeping collision probability for pairs at ``sim_noise``
    below ``max_noise_prob``.

    Search order IS the cost order (see module doc): ascending n_bands
    (exchange bytes), then descending band_bits (bucket occupancy) —
    the first feasible plan found is the cheapest feasible plan, no
    scoring pass needed. Raises ``ValueError`` when no configuration in
    the grid satisfies both constraints (e.g. sim_target and sim_noise
    too close for the grid's resolution — the S-curve cannot be made
    steep enough without more bits/bands)."""
    if not 0.0 < recall_target < 1.0:
        raise ValueError(f"recall_target must be in (0, 1), got {recall_target}")
    if sim_noise is not None and sim_noise >= sim_target:
        raise ValueError(
            f"sim_noise ({sim_noise}) must be below sim_target ({sim_target})"
        )
    for n_bands in range(1, max_bands + 1):
        for band_bits in range(max_bits, 0, -1):
            r = collision_probability(sim_target, n_bands, band_bits)
            if r < recall_target:
                continue  # fewer bits only helps recall; checked next
            noise = (
                collision_probability(sim_noise, n_bands, band_bits)
                if sim_noise is not None
                else None
            )
            if noise is not None and noise > max_noise_prob:
                # more bits already failed recall at this n_bands; fewer
                # bits only raises noise further — this n_bands is out
                break
            return LSHPlan(n_bands, band_bits, r, noise)
    raise ValueError(
        f"no (n_bands<={max_bands}, band_bits<={max_bits}) reaches "
        f"recall {recall_target} at sim {sim_target}"
        + (
            f" with noise <= {max_noise_prob} at sim {sim_noise}"
            if sim_noise is not None
            else ""
        )
    )

"""Numpy AE/CTT trainer tests (SURVEY.md O17-O22): gradient checks, loss
descent, and inference-UDF parity with driver-side forward passes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepblocker_spark.operators.encoders import (
    NumpyAutoEncoder,
    NumpyCTTModel,
    apply_mlp,
    generate_synthetic_training_data,
)

D, H0, H1 = 12, 8, 4


def test_autoencoder_loss_decreases():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, D))
    ae = NumpyAutoEncoder(D, (H0, H1), seed=1)
    losses = ae.train(x, num_epochs=20, batch_size=32)
    assert losses[-1] < losses[0] * 0.9


def test_autoencoder_gradcheck():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, D))
    ae = NumpyAutoEncoder(D, (H0, H1), seed=2)
    loss0, g = ae._forward_backward(x)
    eps = 1e-6
    for name in ("W1", "b2", "W3", "b4"):
        p = ae.p[name]
        idx = (0,) if p.ndim == 1 else (0, 1)
        orig = p[idx]
        p[idx] = orig + eps
        lp, _ = ae._forward_backward(x)
        p[idx] = orig - eps
        lm, _ = ae._forward_backward(x)
        p[idx] = orig
        num = (lp - lm) / (2 * eps)
        assert abs(num - g[name][idx]) < 1e-6, name


def test_ctt_loss_decreases_and_learns():
    rng = np.random.default_rng(2)
    base = rng.normal(size=(100, D))
    pos_r = base + rng.normal(scale=0.01, size=base.shape)
    neg_r = rng.normal(size=(100, D))
    left = np.vstack([base, base])
    right = np.vstack([pos_r, neg_r])
    y = np.array([1] * 100 + [0] * 100)
    m = NumpyCTTModel(D, (H0, H1), seed=3)
    losses = m.train(left, right, y, num_epochs=30, batch_size=32)
    assert losses[-1] < losses[0] * 0.9


def test_apply_mlp_matches_driver_forward(spark):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(30, D)).astype(np.float32)
    ae = NumpyAutoEncoder(D, (H0, H1), seed=5)
    df = spark.createDataFrame(pd.DataFrame({"id": range(30), "embedding": list(x)}))
    out = apply_mlp(df, ae.encoder_layers(), "embedding").collect()
    got = np.stack(
        [np.asarray(r["embedding"], np.float64) for r in sorted(out, key=lambda r: r["id"])]
    )
    expected = ae.encode(x.astype(np.float64))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    assert got.shape == (30, H1)


def test_synthetic_training_data_shape_and_determinism():
    tuples = [f"token{i} common word number {i}" for i in range(10)]
    l1, r1, y1 = generate_synthetic_training_data(tuples, 3, 1, 0.4, seed=42)
    l2, r2, y2 = generate_synthetic_training_data(tuples, 3, 1, 0.4, seed=42)
    assert (l1, r1, y1) == (l2, r2, y2)
    assert len(l1) == 10 * (3 + 3)
    assert sum(y1) == 30
    # positives are perturbed copies: token subset of the original
    for lt, rt, y in zip(l1, r1, y1):
        if y == 1:
            lt_toks = lt.lower().split()
            for t in rt.split():
                assert t in lt_toks

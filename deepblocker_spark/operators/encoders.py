"""Self-supervised encoders in pure numpy (SURVEY.md O17-O22).

The reference trains small torch MLPs (/root/reference/dl_models.py):
  * AutoEncoder: encoder Linear(d,h0)+ReLU+Linear(h0,h1), mirrored decoder,
    MSE loss (dl_models.py:47-105).
  * CTT siamese: summarizer Linear(d,h0)+ReLU+Linear(h0,h1)+ReLU shared by
    both branches; classifier Linear(h1,1) on |e1-e2|; sigmoid+BCE
    (dl_models.py:115-177).
Both: Adam lr=1e-3, 50 epochs, batch 256, shuffled batches
(configurations.py:6-9).

torch is not available in this environment, so the trainers are re-derived
in numpy (same architectures, same losses, same optimizer family, explicit
seed — the reference leaves torch unseeded so its weights vary run-to-run
anyway; parity targets are cluster-level, SURVEY.md §4 determinism note).

Training happens on the DRIVER over a bounded sample — the models are a few
hundred KB and the sample is thousands of rows, trivially small next to the
table being blocked. Inference is pure-numpy matrix algebra inside an
Arrow-batched ``mapInPandas`` with the weights broadcast to executors: no
torch, no per-row Python, executors only do BLAS.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from deepblocker_spark.operators.bc_registry import (
    tracked_broadcast as _tracked,
)


def _linear_init(rng: np.random.Generator, out_dim: int, in_dim: int):
    """torch.nn.Linear default init: U(+-1/sqrt(fan_in)) for W and b."""
    bound = 1.0 / np.sqrt(in_dim)
    w = rng.uniform(-bound, bound, size=(out_dim, in_dim))
    b = rng.uniform(-bound, bound, size=out_dim)
    return w, b


class Adam:
    def __init__(self, params: dict[str, np.ndarray], lr: float = 1e-3,
                 betas=(0.9, 0.999), eps: float = 1e-8):
        self.params = params
        self.lr, self.b1, self.b2, self.eps = lr, betas[0], betas[1], eps
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}
        self.t = 0

    def step(self, grads: dict[str, np.ndarray]):
        self.t += 1
        for k, g in grads.items():
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            mhat = self.m[k] / (1 - self.b1 ** self.t)
            vhat = self.v[k] / (1 - self.b2 ** self.t)
            self.params[k] -= self.lr * mhat / (np.sqrt(vhat) + self.eps)


class NumpyAutoEncoder:
    """300->h0->h1 encoder with mirrored decoder; MSE reconstruction."""

    def __init__(self, input_dim: int, hidden_dims: tuple[int, int], seed: int = 1234):
        rng = np.random.Generator(np.random.PCG64(seed))
        h0, h1 = hidden_dims
        self.p = {}
        self.p["W1"], self.p["b1"] = _linear_init(rng, h0, input_dim)
        self.p["W2"], self.p["b2"] = _linear_init(rng, h1, h0)
        self.p["W3"], self.p["b3"] = _linear_init(rng, h0, h1)
        self.p["W4"], self.p["b4"] = _linear_init(rng, input_dim, h0)
        self.input_dim, self.h0, self.h1 = input_dim, h0, h1
        self._rng = rng

    def encode(self, x: np.ndarray) -> np.ndarray:
        p = self.p
        return np.maximum(x @ p["W1"].T + p["b1"], 0.0) @ p["W2"].T + p["b2"]

    def _forward_backward(self, x: np.ndarray):
        p = self.p
        a1 = x @ p["W1"].T + p["b1"]
        e1 = np.maximum(a1, 0.0)
        z = e1 @ p["W2"].T + p["b2"]
        a3 = z @ p["W3"].T + p["b3"]
        d1 = np.maximum(a3, 0.0)
        out = d1 @ p["W4"].T + p["b4"]
        diff = out - x
        n = diff.size
        loss = float(np.mean(diff * diff))
        dout = (2.0 / n) * diff
        g = {}
        g["W4"] = dout.T @ d1
        g["b4"] = dout.sum(0)
        dd1 = (dout @ p["W4"]) * (a3 > 0)
        g["W3"] = dd1.T @ z
        g["b3"] = dd1.sum(0)
        dz = dd1 @ p["W3"]
        g["W2"] = dz.T @ e1
        g["b2"] = dz.sum(0)
        de1 = (dz @ p["W2"]) * (a1 > 0)
        g["W1"] = de1.T @ x
        g["b1"] = de1.sum(0)
        return loss, g

    def train(self, x: np.ndarray, num_epochs: int = 50, batch_size: int = 256,
              lr: float = 1e-3) -> list[float]:
        x = np.nan_to_num(np.asarray(x, dtype=np.float64))
        opt = Adam(self.p, lr=lr)
        n = len(x)
        losses = []
        for _ in range(num_epochs):
            order = self._rng.permutation(n)
            total = 0.0
            for s in range(0, n, batch_size):
                batch = x[order[s : s + batch_size]]
                loss, g = self._forward_backward(batch)
                opt.step(g)
                total += loss
            losses.append(total)
        return losses

    def encoder_layers(self) -> list[tuple[np.ndarray, np.ndarray, bool]]:
        """[(W, b, relu_after), ...] for the broadcastable inference UDF."""
        return [
            (self.p["W1"].copy(), self.p["b1"].copy(), True),
            (self.p["W2"].copy(), self.p["b2"].copy(), False),
        ]


class NumpyCTTModel:
    """Siamese summarizer + |diff| classifier, sigmoid + BCE
    (dl_models.py:115-137)."""

    def __init__(self, input_dim: int, hidden_dims: tuple[int, int], seed: int = 1234):
        rng = np.random.Generator(np.random.PCG64(seed))
        h0, h1 = hidden_dims
        self.p = {}
        self.p["S1"], self.p["c1"] = _linear_init(rng, h0, input_dim)
        self.p["S2"], self.p["c2"] = _linear_init(rng, h1, h0)
        self.p["Wc"], self.p["bc"] = _linear_init(rng, 1, h1)
        self._rng = rng

    def _branch(self, x: np.ndarray):
        p = self.p
        a1 = x @ p["S1"].T + p["c1"]
        h1 = np.maximum(a1, 0.0)
        a2 = h1 @ p["S2"].T + p["c2"]
        h2 = np.maximum(a2, 0.0)
        return a1, h1, a2, h2

    def summarize(self, x: np.ndarray) -> np.ndarray:
        return self._branch(x)[3]

    def _backward_branch(self, dh2, x, a1, h1, a2, g):
        p = self.p
        da2 = dh2 * (a2 > 0)
        g["S2"] += da2.T @ h1
        g["c2"] += da2.sum(0)
        dh1 = (da2 @ p["S2"]) * (a1 > 0)
        g["S1"] += dh1.T @ x
        g["c1"] += dh1.sum(0)

    def train(self, left: np.ndarray, right: np.ndarray, labels: np.ndarray,
              num_epochs: int = 50, batch_size: int = 256, lr: float = 1e-3) -> list[float]:
        left = np.nan_to_num(np.asarray(left, dtype=np.float64))
        right = np.nan_to_num(np.asarray(right, dtype=np.float64))
        y = np.asarray(labels, dtype=np.float64).reshape(-1, 1)
        opt = Adam(self.p, lr=lr)
        n = len(left)
        losses = []
        p = self.p
        for _ in range(num_epochs):
            order = self._rng.permutation(n)
            total = 0.0
            for s in range(0, n, batch_size):
                idx = order[s : s + batch_size]
                xl, xr, yb = left[idx], right[idx], y[idx]
                a1l, h1l, a2l, h2l = self._branch(xl)
                a1r, h1r, a2r, h2r = self._branch(xr)
                z = np.abs(h2l - h2r)
                logit = z @ p["Wc"].T + p["bc"]
                prob = 1.0 / (1.0 + np.exp(-logit))
                eps = 1e-12
                loss = float(
                    -np.mean(yb * np.log(prob + eps) + (1 - yb) * np.log(1 - prob + eps))
                )
                b = len(idx)
                dlogit = (prob - yb) / b
                g = {k: np.zeros_like(v) for k, v in p.items()}
                g["Wc"] = dlogit.T @ z
                g["bc"] = dlogit.sum(0)
                dz = dlogit @ p["Wc"]
                sign = np.sign(h2l - h2r)
                self._backward_branch(dz * sign, xl, a1l, h1l, a2l, g)
                self._backward_branch(-dz * sign, xr, a1r, h1r, a2r, g)
                opt.step(g)
                total += loss
            losses.append(total)
        return losses

    def summarizer_layers(self) -> list[tuple[np.ndarray, np.ndarray, bool]]:
        return [
            (self.p["S1"].copy(), self.p["c1"].copy(), True),
            (self.p["S2"].copy(), self.p["c2"].copy(), True),
        ]


def apply_mlp(df: DataFrame, layers: list[tuple[np.ndarray, np.ndarray, bool]],
              emb_col: str = "embedding") -> DataFrame:
    """Replace ``emb_col`` with the MLP image of it — numpy forward pass per
    Arrow batch, weights broadcast once (O18: inference without torch)."""
    spark = df.sparkSession
    bc = _tracked(spark.sparkContext, layers)
    out_fields = [
        f if f.name != emb_col else StructField(emb_col, ArrayType(FloatType()), False)
        for f in df.schema.fields
    ]
    schema = StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ls = bc.value
        for pdf in batches:
            if len(pdf):
                x = np.nan_to_num(np.stack(pdf[emb_col].to_numpy()).astype(np.float64))
                for w, b, relu in ls:
                    x = x @ w.T + b
                    if relu:
                        np.maximum(x, 0.0, out=x)
                out = pdf.copy()
                out[emb_col] = list(x.astype(np.float32))
                yield out
            else:
                yield pdf

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# O33 — model persistence (reference: torch.save(state_dict),
# dl_models.py:107-113,179-185; here: numpy .npz of the parameter dict).
# Part of the checkpoint/lineage story: a resumed run reloads encoder
# weights instead of retraining.
# ---------------------------------------------------------------------------

def save_model(model, path: str) -> None:
    np.savez(path, **model.p)


def load_autoencoder(path: str, input_dim: int, hidden_dims: tuple[int, int]) -> "NumpyAutoEncoder":
    m = NumpyAutoEncoder(input_dim, hidden_dims)
    _load_params(m, path)
    return m


def load_ctt(path: str, input_dim: int, hidden_dims: tuple[int, int]) -> "NumpyCTTModel":
    m = NumpyCTTModel(input_dim, hidden_dims)
    _load_params(m, path)
    return m


def _load_params(model, path: str) -> None:
    data = np.load(path)
    missing = set(model.p) - set(data.files)
    if missing:
        raise ValueError(f"checkpoint at {path} missing parameters {sorted(missing)}")
    for k in model.p:
        if model.p[k].shape != data[k].shape:
            raise ValueError(
                f"shape mismatch for {k}: model {model.p[k].shape} vs saved {data[k].shape}"
            )
        model.p[k] = data[k].copy()


# ---------------------------------------------------------------------------
# O19 — synthetic training pairs (driver-side, seeded; the reference seeds
# python's RNG at tuple_embedding_models.py:201 via RANDOM_SEED=1234)
# ---------------------------------------------------------------------------

def generate_synthetic_training_data(
    tuples: list[str],
    synth_tuples_per_tuple: int = 5,
    pos_to_neg_ratio: int = 1,
    max_perturbation: float = 0.4,
    seed: int = 1234,
) -> tuple[list[str], list[str], list[int]]:
    """Positives: copies with randint(0, floor(0.4*len)) tokens deleted;
    negatives: uniformly random other tuple
    (tuple_embedding_models.py:187-232)."""
    import random

    from deepblocker_spark.functions.tokenizer import basic_english_tokenize

    rng = random.Random(seed)
    n_pos = synth_tuples_per_tuple
    n_neg = synth_tuples_per_tuple * pos_to_neg_ratio
    left: list[str] = []
    right: list[str] = []
    labels: list[int] = []
    for t in tuples:
        toks = basic_english_tokenize(t)
        max_remove = int(len(toks) * max_perturbation)
        for _ in range(n_pos):
            copy = toks[:]
            for _ in range(rng.randint(0, max_remove)):
                copy.pop(rng.randint(0, len(copy) - 1))
            left.append(t)
            right.append(" ".join(copy))
            labels.append(1)
        for _ in range(n_neg):
            left.append(t)
            right.append(rng.choice(tuples))
            labels.append(0)
    return left, right, labels

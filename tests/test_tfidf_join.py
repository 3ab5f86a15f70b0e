"""Weighted AllPairs join (scoring.tfidf_cosine_join): the maxweight-
ordered prefix pruning must be LOSSLESS — output equals a brute-force
TF-IDF cosine over every pair, across thresholds and edge cases."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import numpy as np

from deepblocker_spark.functions.tokenizer import basic_english_tokenize
from deepblocker_spark.operators.scoring import tfidf_cosine_join


def _brute(texts, threshold):
    toks = [basic_english_tokenize(x) for x in texts]
    n = len(texts)
    tf = [Counter(ts) for ts in toks]
    df = Counter()
    for c in tf:
        df.update(c.keys())
    vecs = []
    for c in tf:
        v = {t: k * (math.log((n + 1) / (df[t] + 1)) + 1.0) for t, k in c.items()}
        nr = math.sqrt(sum(x * x for x in v.values()))
        vecs.append({t: x / nr for t, x in v.items()} if nr else {})
    out = {}
    for a, b in itertools.combinations(range(n), 2):
        dot = sum(w * vecs[b].get(t, 0.0) for t, w in vecs[a].items())
        if dot >= threshold:
            out[(a, b)] = round(dot, 6)
    return out


def _texts(seed, n_docs=70):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    base = [
        " ".join(rng.choice(vocab, size=rng.integers(6, 14)))
        for _ in range(n_docs // 2)
    ]
    texts = list(base)
    for t in base[: n_docs - len(base)]:
        words = t.split()
        words[rng.integers(0, len(words))] = str(rng.choice(vocab))
        texts.append(" ".join(words))
    return texts


def _run(spark, texts, t):
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(texts)], "id long, text string"
    )
    out = tfidf_cosine_join(df, threshold=t)
    return {(r["a"], r["b"]): round(r["tfidf_cos"], 6) for r in out.collect()}


def test_allpairs_equals_brute_force(spark):
    texts = _texts(31)
    for t in (0.4, 0.6, 0.8):
        assert _run(spark, texts, t) == _brute(texts, t), t


def test_allpairs_identical_docs_score_one(spark):
    texts = ["alpha beta gamma", "alpha beta gamma", "delta epsilon zeta"]
    got = _run(spark, texts, 0.99)
    assert set(got) == {(0, 1)} and abs(got[(0, 1)] - 1.0) < 1e-6


def test_allpairs_disjoint_docs_empty(spark):
    got = _run(spark, ["a b c", "x y z"], 0.1)
    assert got == {}

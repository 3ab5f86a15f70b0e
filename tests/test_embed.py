"""Embedding-operator tests (SURVEY.md O12-O16) against straight-line numpy
oracles built from the same reference formulas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from deepblocker_spark.functions.tokenizer import basic_english_tokenize
from deepblocker_spark.functions.wordvec import HashWordVectors
from deepblocker_spark.operators.embed import (
    EMBEDDING,
    N_TOKENS,
    collect_sif_weights,
    embed_tuples,
    remove_principal_component,
    sif_weights_df,
    token_frequencies,
)

DIM = 16


def _texts_df(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, " "),  # null-imputation value -> zero tokens
            (4, "apple"),
        ],
        ["id", "_merged_text"],
    )


def _oracle_avg(text: str, dim: int) -> np.ndarray:
    wv = HashWordVectors(dim)
    toks = basic_english_tokenize(text)
    if not toks:
        return np.zeros(dim)
    return np.mean(np.stack([wv.get_word_vector(t) for t in toks]).astype(np.float64), axis=0)


def test_fasttext_backend_provider_contract():
    """VERDICT r4 #5: exercise the real-fastText seam when a model is
    available — skip cleanly otherwise. Set SPARK_GRAFT_FASTTEXT_BIN to a
    real .bin to activate (the fasttext package + model are not in this
    sandbox). Contract checked: dim matches the model, lookups are
    deterministic, OOV tokens get a NON-ZERO subword-composed vector (the
    semantic where the hermetic hash provider diverges), and matrix()
    stacks in input order."""
    import importlib.util
    import os

    model_path = os.environ.get("SPARK_GRAFT_FASTTEXT_BIN", "")
    if importlib.util.find_spec("fasttext") is None:
        pytest.skip("fasttext not installed — seam is env-gated")
    if not model_path or not os.path.exists(model_path):
        pytest.skip("SPARK_GRAFT_FASTTEXT_BIN not set — no model to load")

    from deepblocker_spark.functions.wordvec import FastTextWordVectors

    wv = FastTextWordVectors(model_path)
    assert wv.dim > 0
    a = wv.get_word_vector("spark")
    b = wv.get_word_vector("spark")
    assert a.shape == (wv.dim,) and np.array_equal(a, b)
    # subword composition: an OOV token must still get a non-zero vector
    oov = wv.get_word_vector("zqxjkvwpfy")
    assert oov.shape == (wv.dim,) and np.abs(oov).sum() > 0
    mat = wv.matrix(["spark", "zqxjkvwpfy", "spark"])
    assert mat.shape == (3, wv.dim)
    assert np.array_equal(mat[0], mat[2]) and np.array_equal(mat[0], a)


def test_wordvec_deterministic_across_instances():
    a = HashWordVectors(DIM).get_word_vector("spark")
    b = HashWordVectors(DIM).get_word_vector("spark")
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32
    assert not np.array_equal(a, HashWordVectors(DIM).get_word_vector("flink"))


def test_token_frequencies(spark):
    freq = {r["token"]: r["freq"] for r in token_frequencies(_texts_df(spark)).collect()}
    assert freq == {"apple": 3, "banana": 2, "cherry": 1}


def test_sif_weights_formula(spark):
    freq = token_frequencies(_texts_df(spark))
    w = {r["token"]: r["weight"] for r in sif_weights_df(freq, a=1e-3).collect()}
    total = 6
    for tok, f in [("apple", 3), ("banana", 2), ("cherry", 1)]:
        expected = 1e-3 / (1e-3 + f / total)
        assert w[tok] == pytest.approx(expected, rel=1e-12)


def test_sif_min_freq_gives_weight_one(spark):
    freq = token_frequencies(_texts_df(spark))
    w = {r["token"]: r["weight"] for r in sif_weights_df(freq, a=1e-3, min_freq=2).collect()}
    assert w["cherry"] == 1.0
    assert w["apple"] < 1.0


def test_average_embedding_matches_oracle(spark):
    out = embed_tuples(_texts_df(spark), dim=DIM).collect()
    by_id = {r["id"]: r for r in out}
    for rid, text in [(1, "apple banana apple"), (2, "banana cherry"), (4, "apple")]:
        np.testing.assert_allclose(
            np.asarray(by_id[rid][EMBEDDING], dtype=np.float64),
            _oracle_avg(text, DIM),
            rtol=1e-5,
        )
    # zero-token row -> zero vector + count 0 (policy default)
    assert by_id[3][N_TOKENS] == 0
    assert np.allclose(by_id[3][EMBEDDING], 0.0)


def test_sif_embedding_divides_by_count_not_weightsum(spark):
    # SIF nuance (tuple_embedding_models.py:130): mean of weighted vectors.
    weights = {"apple": 0.5, "banana": 0.1}
    out = embed_tuples(_texts_df(spark), dim=DIM, weights=weights).collect()
    by_id = {r["id"]: np.asarray(r[EMBEDDING], np.float64) for r in out}
    wv = HashWordVectors(DIM)
    expected = (
        0.5 * wv.get_word_vector("apple").astype(np.float64) * 2
        + 0.1 * wv.get_word_vector("banana").astype(np.float64)
    ) / 3.0
    np.testing.assert_allclose(by_id[1], expected, rtol=1e-5)
    # unseen token defaults to weight 1.0 (cherry not in dict)
    expected2 = (
        0.1 * wv.get_word_vector("banana").astype(np.float64)
        + 1.0 * wv.get_word_vector("cherry").astype(np.float64)
    ) / 2.0
    np.testing.assert_allclose(by_id[2], expected2, rtol=1e-5)


def test_nan_policy_reproduces_reference(spark):
    out = embed_tuples(_texts_df(spark), dim=DIM, empty_row_policy="nan").collect()
    by_id = {r["id"]: r for r in out}
    assert all(np.isnan(v) for v in by_id[3][EMBEDDING])


def test_remove_pc_matches_numpy_svd(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, DIM))
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(40), EMBEDDING: [r.astype(np.float32) for r in x]})
    )
    out = remove_principal_component(df, EMBEDDING, DIM).collect()
    got = np.stack([np.asarray(r[EMBEDDING], np.float64) for r in sorted(out, key=lambda r: r["id"])])
    # numpy oracle: top right-singular vector of the uncentered matrix
    x32 = x.astype(np.float32).astype(np.float64)
    _, _, vt = np.linalg.svd(x32, full_matrices=False)
    pc = vt[0]
    expected = x32 - np.outer(x32 @ pc, pc)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_collect_sif_weights_cap(spark):
    freq = token_frequencies(_texts_df(spark))
    w = collect_sif_weights(sif_weights_df(freq), max_vocab=2)
    assert set(w) == {"apple", "banana"}  # top-2 by frequency


def test_embed_tokens_col_bit_identical(spark):
    """The JVM-tokenized handoff (embed_tuples(tokens_col=...)) must produce
    bit-identical embeddings to the Python-tokenizing path, including null
    and empty texts, and must not leak the tokens column into the output."""
    from pyspark.sql import functions as F

    from deepblocker_spark.functions.tokenizer import tokens_col

    rows = [
        (1, "apple banana apple pie!"),
        (2, "  WeIrD   spacing\tand, punct?"),
        (3, ""),
        (4, None),
        (5, "the quick brown fox"),
    ]
    df = spark.createDataFrame(rows, ["id", "_merged_text"])
    w = {"apple": 0.3, "banana": 0.7, "the": 0.1}
    a = embed_tuples(df, "_merged_text", dim=16, weights=w).orderBy("id").collect()
    b = (
        embed_tuples(
            df.withColumn("_toks", tokens_col("_merged_text")),
            "_merged_text", dim=16, weights=w, tokens_col="_toks",
        )
        .orderBy("id")
        .collect()
    )
    assert [r["id"] for r in a] == [r["id"] for r in b]
    assert "_toks" not in b[0].asDict()
    for ra, rb in zip(a, b):
        assert ra[N_TOKENS] == rb[N_TOKENS]
        assert list(ra[EMBEDDING]) == list(rb[EMBEDDING])  # bit-exact

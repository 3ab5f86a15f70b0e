"""End-to-end parity: the Spark pipeline vs the single-node reference-
semantics oracle (tests/oracle.py) on the seeded dyadic fixture
(FIXTURES.md F2). Asserts embedding-level closeness and exact candidate-set
equality under the documented tie-break."""

from __future__ import annotations

import numpy as np
import pytest

from deepblocker_spark.config import BlockerConfig
from deepblocker_spark.fixtures import dyadic_tables
from deepblocker_spark.operators.preprocess import MERGED_TEXT, build_corpus, preprocess_table
from deepblocker_spark.operators.topk import ExactTopKVectorPairing
from deepblocker_spark.pipeline import SparkSIFEmbedding

from tests.oracle import (
    oracle_preprocess,
    oracle_sif_embed,
    oracle_sif_weights,
    oracle_topk,
)

DIM = 48
COLS = ["title", "manufacturer", "price"]


@pytest.fixture(scope="module")
def fixture_tables(spark):
    a, b, matches = dyadic_tables(n=40, seed=123)
    return a, b, spark.createDataFrame(a), spark.createDataFrame(b)


def test_preprocess_parity(spark, fixture_tables):
    a_pd, _, a_sp, _ = fixture_tables
    got = {
        r["id"]: r[MERGED_TEXT]
        for r in preprocess_table(a_sp, COLS).collect()
    }
    expected = oracle_preprocess(a_pd, COLS + ["id"])
    for rid, text in zip(expected["id"], expected["_merged_text"]):
        assert got[rid] == text, rid


def test_full_dyadic_blocking_parity(spark, fixture_tables):
    a_pd, b_pd, a_sp, b_sp = fixture_tables
    cfg = BlockerConfig(emb_dim=DIM, top_k=5)

    # --- Spark pipeline ---
    left_pre = preprocess_table(a_sp, COLS)
    right_pre = preprocess_table(b_sp, COLS)
    model = SparkSIFEmbedding(cfg)
    model.preprocess(build_corpus(left_pre, right_pre))
    left_emb = model.embed(left_pre).persist()
    right_emb = model.embed(right_pre).persist()
    pairing = ExactTopKVectorPairing(k=5)
    pairing.index(right_emb)
    spark_pairs = {
        (r["l_id"], r["r_id"]) for r in pairing.query(left_emb).collect()
    }

    # --- oracle ---
    a_m = oracle_preprocess(a_pd, COLS + ["id"])
    b_m = oracle_preprocess(b_pd, COLS + ["id"])
    weights = oracle_sif_weights(list(a_m["_merged_text"]) + list(b_m["_merged_text"]))
    le = oracle_sif_embed(list(a_m["_merged_text"]), DIM, weights)
    re_ = oracle_sif_embed(list(b_m["_merged_text"]), DIM, weights)
    oracle_pairs = oracle_topk(list(a_m["id"]), le, list(b_m["id"]), re_, k=5)

    # embedding-level closeness (same formulas, float32 vs float64 paths)
    spark_le = {
        r["id"]: np.asarray(r["embedding"], np.float64)
        for r in left_emb.select("id", "embedding").collect()
    }
    mat = np.stack([spark_le[i] for i in a_m["id"]])
    np.testing.assert_allclose(mat, le, atol=5e-4)

    # candidate-set equality
    assert spark_pairs == oracle_pairs


def test_sif_weights_parity(spark, fixture_tables):
    a_pd, b_pd, a_sp, b_sp = fixture_tables
    cfg = BlockerConfig(emb_dim=DIM)
    left_pre = preprocess_table(a_sp, COLS)
    right_pre = preprocess_table(b_sp, COLS)
    model = SparkSIFEmbedding(cfg)
    model.preprocess(build_corpus(left_pre, right_pre))
    a_m = oracle_preprocess(a_pd, COLS + ["id"])
    b_m = oracle_preprocess(b_pd, COLS + ["id"])
    expected = oracle_sif_weights(list(a_m["_merged_text"]) + list(b_m["_merged_text"]))
    assert set(model.weights) == set(expected)
    for tok, w in expected.items():
        assert model.weights[tok] == pytest.approx(w, rel=1e-12), tok

"""Exact top-K cosine join tests (SURVEY.md O23-O25) against a brute-force
numpy oracle implementing the reference semantics
(/root/reference/vector_pairing_models.py:36-49) with the documented
deterministic tie-break (sim desc, r_id asc)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepblocker_spark.operators.topk import exact_topk_join


def _emb_df(spark, n, dim, seed, id_start=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"id": range(id_start, id_start + n), "embedding": list(x)})
    return spark.createDataFrame(pdf), x


def _oracle_topk(lx, rx, k, l_ids, r_ids, exclude_self=False):
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.maximum(n, 1e-30)

    sims = norm(lx.astype(np.float64)) @ norm(rx.astype(np.float64)).T
    out = set()
    for i, lid in enumerate(l_ids):
        order = sorted(range(len(r_ids)), key=lambda j: (-sims[i, j], r_ids[j]))
        cnt = 0
        for j in order:
            if exclude_self and r_ids[j] == lid:
                continue
            out.add((lid, r_ids[j], round(sims[i, j], 9)))
            cnt += 1
            if cnt == k:
                break
    return out


def _collect_pairs(df):
    return {(r["l_id"], r["r_id"], round(r["sim"], 9)) for r in df.collect()}


def test_topk_matches_oracle(spark):
    left, lx = _emb_df(spark, 30, 8, seed=1)
    right, rx = _emb_df(spark, 25, 8, seed=2, id_start=100)
    got = _collect_pairs(exact_topk_join(left, right, k=5))
    expected = _oracle_topk(lx, rx, 5, list(range(30)), list(range(100, 125)))
    assert got == expected


def test_topk_chunked_equals_single_chunk(spark):
    left, lx = _emb_df(spark, 20, 8, seed=3)
    right, rx = _emb_df(spark, 37, 8, seed=4, id_start=500)
    whole = _collect_pairs(exact_topk_join(left, right, k=7))
    chunked = _collect_pairs(exact_topk_join(left, right, k=7, max_broadcast_rows=10))
    assert whole == chunked


def test_k_exceeding_right_truncates(spark):
    # numpy slice semantics: K > N_right silently truncates
    left, _ = _emb_df(spark, 5, 8, seed=5)
    right, _ = _emb_df(spark, 3, 8, seed=6, id_start=10)
    out = exact_topk_join(left, right, k=50)
    assert out.count() == 5 * 3


def test_exclude_self(spark):
    df, x = _emb_df(spark, 10, 8, seed=7)
    out = exact_topk_join(df, df, k=3, exclude_self=True)
    rows = out.collect()
    assert all(r["l_id"] != r["r_id"] for r in rows)
    expected = _oracle_topk(x, x, 3, list(range(10)), list(range(10)), exclude_self=True)
    assert _collect_pairs(out) == expected


def test_candidate_count_property(spark):
    left, _ = _emb_df(spark, 12, 8, seed=8)
    right, _ = _emb_df(spark, 9, 8, seed=9, id_start=50)
    for k in (1, 4, 9, 20):
        assert exact_topk_join(left, right, k=k).count() == 12 * min(k, 9)


def test_rank_column_dense_and_ordered(spark):
    left, _ = _emb_df(spark, 6, 8, seed=10)
    right, _ = _emb_df(spark, 8, 8, seed=11, id_start=30)
    pdf = exact_topk_join(left, right, k=4).toPandas()
    for _, grp in pdf.groupby("l_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == [1, 2, 3, 4]
        sims = list(grp["sim"])
        assert sims == sorted(sims, reverse=True)


def test_zero_vector_rows_get_sim_zero(spark):
    lx = np.zeros((2, 8), dtype=np.float32)
    pdf = pd.DataFrame({"id": [0, 1], "embedding": list(lx)})
    left = spark.createDataFrame(pdf)
    right, _ = _emb_df(spark, 4, 8, seed=12, id_start=10)
    rows = exact_topk_join(left, right, k=2).collect()
    assert all(r["sim"] == 0.0 for r in rows)


def test_topk_right_rows_hint_multi_chunk_identical(spark):
    from deepblocker_spark.operators.topk import exact_topk_join as ej
    left, _ = _emb_df(spark, 15, 8, seed=11)
    right, _ = _emb_df(spark, 33, 8, seed=12, id_start=900)
    whole = _collect_pairs(ej(left, right, k=6))
    hinted_single = _collect_pairs(ej(left, right, k=6, right_rows=33))
    hinted_multi = _collect_pairs(ej(left, right, k=6, max_broadcast_rows=8, right_rows=33))
    assert whole == hinted_single == hinted_multi


def test_threshold_join_chunked_equals_single_chunk(spark):
    from deepblocker_spark.operators.topk import cosine_threshold_join

    left, _ = _emb_df(spark, 25, 8, seed=13)
    right, _ = _emb_df(spark, 31, 8, seed=14, id_start=700)

    def as_set(df):
        return {(r["l_id"], r["r_id"], round(r["sim"], 9)) for r in df.collect()}

    whole = as_set(cosine_threshold_join(left, right, 0.3, upper_only=False))
    chunked = as_set(cosine_threshold_join(left, right, 0.3, upper_only=False,
                                           max_broadcast_rows=7))
    assert whole == chunked and len(whole) > 0

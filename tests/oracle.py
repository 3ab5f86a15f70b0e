"""Single-node pandas/numpy oracle implementing the reference's semantics
(SURVEY.md §5.2). Formulas follow the cited reference lines exactly:

  * preprocess: fillna(' ') BEFORE astype(str), then ' '-join of non-id
    cols in declared order (/root/reference/deep_blocker.py:29-45)
  * SIF: w = a/(a + freq/total) if freq >= min_freq else 1.0
    (/root/reference/tuple_embedding_models.py:106-119); embedding = np.mean
    of weighted vectors — divides by token count (:124-130)
  * PC removal: top right-singular vector of the uncentered matrix,
    subtracted per table (:134-141)
  * top-K: full cosine matrix, per-row selection (vector_pairing_models.py:
    36-49), with OUR documented deterministic tie-break (sim desc, r_id asc)

The oracle uses the same tokenizer and hash word-vector provider modules as
the engine — those are independently parity-tested against torchtext
semantics (FIXTURES.md F4) and DuckDB.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from deepblocker_spark.functions.tokenizer import basic_english_tokenize
from deepblocker_spark.functions.wordvec import HashWordVectors


def oracle_preprocess(df: pd.DataFrame, cols_to_block: list[str], id_col: str = "id") -> pd.DataFrame:
    cols = [c for c in cols_to_block if c != id_col]
    work = df[cols].fillna(" ").astype(str)
    merged = work.agg(" ".join, axis=1)
    return pd.DataFrame({id_col: df[id_col].values, "_merged_text": merged.values})


def oracle_sif_weights(corpus: list[str], a: float = 1e-3, min_freq: int = 0) -> dict[str, float]:
    freq: Counter = Counter()
    for text in corpus:
        freq.update(basic_english_tokenize(text))
    total = sum(freq.values())
    return {
        tok: (a / (a + f / total) if f >= min_freq else 1.0)
        for tok, f in freq.items()
    }


def oracle_sif_embed(
    texts: list[str], dim: int, weights: dict[str, float], remove_pc: bool = True
) -> np.ndarray:
    wv = HashWordVectors(dim)
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = basic_english_tokenize(t)
        if toks:
            vecs = np.stack(
                [wv.get_word_vector(tok).astype(np.float64) * weights.get(tok, 1.0) for tok in toks]
            )
            out[i] = vecs.mean(axis=0)
    if remove_pc and len(out) >= 2:
        # engine computes in float32 then removes PC in float64 — mirror that
        x = out.astype(np.float32).astype(np.float64)
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        pc = vt[0]
        out = x - np.outer(x @ pc, pc)
    return out


def oracle_topk(
    l_ids: list, lmat: np.ndarray, r_ids: list, rmat: np.ndarray, k: int,
    exclude_self: bool = False,
) -> set[tuple]:
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.maximum(n, 1e-30)

    sims = norm(np.nan_to_num(lmat)) @ norm(np.nan_to_num(rmat)).T
    pairs = set()
    for i, lid in enumerate(l_ids):
        order = sorted(range(len(r_ids)), key=lambda j: (-sims[i, j], r_ids[j]))
        cnt = 0
        for j in order:
            if exclude_self and r_ids[j] == lid:
                continue
            pairs.add((lid, r_ids[j]))
            cnt += 1
            if cnt == k:
                break
    return pairs

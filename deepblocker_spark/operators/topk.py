"""Exact top-K cosine similarity join (SURVEY.md O23-O25).

The reference materializes the full N_l x N_r cosine matrix and argsorts
every row (/root/reference/vector_pairing_models.py:36-49) — an O(N^2)
memory wall. The Spark re-expression:

  * the right table's (id, embedding) is collected in bounded chunks and
    broadcast; a mapInPandas over the left table computes, per Arrow batch,
    the batch x chunk similarity block with one BLAS matmul, then takes the
    per-row top K via ``np.argpartition`` (no full sort — an algorithmic
    improvement over the reference's per-row argsort, same result set);
  * with multiple chunks, per-chunk partial top-Ks are unioned and reduced
    to the global top K with ``row_number()`` over a window — the classic
    partial+final top-K. With a single chunk the window is skipped
    entirely: the per-batch result already is the global top K.

The candidate set is emitted directly as a pair table (l_id, r_id, sim,
rank) — the reference's separate melt step (blocking_utils.py:3-13)
dissolves into the operator. Ties break deterministically by
(sim desc, r_id asc); the reference's numpy introsort tie order is
unspecified, a documented divergence (SURVEY.md O24).

At true web scale the exact join stays the per-bucket oracle; the scale path
is LSH candidate generation (operators/lsh.py) which reuses this module's
kernel per bucket.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from deepblocker_spark.operators.embed import EMBEDDING


def normalize_rows(x: np.ndarray) -> np.ndarray:
    """L2-normalize rows; zero rows stay zero (cosine vs zero vector := 0,
    guarding the reference's 0/0 NaN, SURVEY.md §2.1 edge cases)."""
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    np.maximum(norms, 1e-30, out=norms)
    return x / norms


def _collect_right(right: DataFrame, r_id: str, emb_col: str):
    rows = right.select(r_id, emb_col).collect()
    ids = [r[0] for r in rows]
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    if mat.ndim == 1:  # empty
        mat = mat.reshape(0, 0)
    return ids, normalize_rows(np.nan_to_num(mat))


def _topk_block(
    sims: np.ndarray, k: int, r_ids: np.ndarray, exclude: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row top-k of a (b x m) similarity block with deterministic
    (sim desc, r_id asc) tie-break. Returns (row_idx, col_ids, sims)."""
    b, m = sims.shape
    if exclude is not None:
        sims = sims.copy()
        sims[exclude] = -np.inf
    kk = min(k, m)
    if kk < m:
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    else:
        part = np.broadcast_to(np.arange(m), (b, m)).copy()
    rows = np.repeat(np.arange(b), part.shape[1])
    cols = part.ravel()
    s = sims[rows, cols]
    # Sort the k selected per row by (-sim, r_id) for a deterministic order.
    sel_rids = r_ids[cols]
    order = np.lexsort((sel_rids, -s, rows))
    rows, cols, s = rows[order], cols[order], s[order]
    keep = s > -np.inf
    return rows[keep], cols[keep], s[keep]


PAIR_FIELDS = ["l_id", "r_id", "sim", "rank"]


def exact_topk_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    l_id: str = "id",
    r_id: str = "id",
    emb_col: str = EMBEDDING,
    exclude_self: bool = False,
    max_broadcast_rows: int = 500_000,
) -> DataFrame:
    """-> DataFrame(l_id, r_id, sim double, rank int), rank 1..k per l_id.

    ``exclude_self`` drops l_id == r_id pairs (self-blocking / dedup mode).
    K > N_right truncates silently, matching numpy slice semantics
    (vector_pairing_models.py:46).
    """
    spark = left.sparkSession
    r_ids_all, r_mat_all = _collect_right(right, r_id, emb_col)
    n_right = len(r_ids_all)
    id_field = right.select(r_id).schema.fields[0].dataType

    pair_schema = StructType(
        [
            StructField("l_id", left.select(l_id).schema.fields[0].dataType, True),
            StructField("r_id", id_field, True),
            StructField("sim", DoubleType(), False),
            StructField("rank", IntegerType(), False),
        ]
    )

    chunks = []
    for start in range(0, max(n_right, 1), max_broadcast_rows):
        ids_c = np.asarray(r_ids_all[start : start + max_broadcast_rows])
        mat_c = r_mat_all[start : start + max_broadcast_rows]
        chunks.append((ids_c, mat_c))
    single_chunk = len(chunks) == 1

    def make_runner(ids_c: np.ndarray, mat_c: np.ndarray):
        bc = spark.sparkContext.broadcast((ids_c, mat_c))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            rids, rmat = bc.value
            for pdf in batches:
                if not len(pdf) or rmat.size == 0:
                    continue
                lids = pdf[l_id].to_numpy()
                lmat = normalize_rows(
                    np.nan_to_num(np.stack(pdf[emb_col].to_numpy()).astype(np.float64))
                )
                sims = lmat @ rmat.T
                exclude = None
                if exclude_self:
                    exclude = lids[:, None] == rids[None, :]
                rows, cols, s = _topk_block(sims, k, rids, exclude)
                if not len(rows):
                    continue
                out = pd.DataFrame(
                    {
                        "l_id": lids[rows],
                        "r_id": rids[cols],
                        "sim": s,
                    }
                )
                # rank within this chunk (final rank re-derived post-merge
                # when chunked; exact already when single-chunk). Group by the
                # batch row index, not l_id, in case of duplicate left keys.
                out["rank"] = (
                    out.groupby(rows, sort=False).cumcount().astype("int32") + 1
                )
                yield out

        return run

    parts = [
        left.select(l_id, emb_col).mapInPandas(make_runner(ids_c, mat_c), pair_schema)
        for ids_c, mat_c in chunks
    ]
    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)

    if not single_chunk:
        w = Window.partitionBy("l_id").orderBy(F.desc("sim"), F.asc("r_id"))
        result = (
            result.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    return result


class ExactTopKVectorPairing:
    """Reference interface seam (vector_pairing_models.py:7-18,21-49) with
    DataFrame-in/DataFrame-out signatures: index(right_df) then
    query(left_df) -> pair table."""

    def __init__(self, k: int = 50, exclude_self: bool = False, max_broadcast_rows: int = 500_000):
        self.k = k
        self.exclude_self = exclude_self
        self.max_broadcast_rows = max_broadcast_rows
        self._right: DataFrame | None = None

    def index(self, right: DataFrame, r_id: str = "id", emb_col: str = EMBEDDING):
        self._right = right
        self._r_id = r_id
        self._emb_col = emb_col
        return self

    def query(self, left: DataFrame, l_id: str = "id", emb_col: str | None = None) -> DataFrame:
        if self._right is None:
            raise RuntimeError("call index(right_df) before query(left_df)")
        return exact_topk_join(
            left,
            self._right,
            self.k,
            l_id=l_id,
            r_id=self._r_id,
            emb_col=emb_col or self._emb_col,
            exclude_self=self.exclude_self,
            max_broadcast_rows=self.max_broadcast_rows,
        )

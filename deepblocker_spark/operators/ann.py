"""Approximate-nearest-neighbor search over an embedding column.

Two strategies behind one call shape, both returning (l_id, r_id, sim, rank):

  * brute-force exact top-k (operators/topk.py) — the baseline/oracle; right
    side bounded-broadcast, per-batch BLAS + argpartition.
  * LSH-bucketed (operators/lsh.py) — the scale path; cost bounded by
    bucket sizes instead of N^2.

``recall_at_k`` measures the approximate path against the exact oracle —
the harness SURVEY.md §7.4(1) calls for when tuning LSH parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepblocker_spark.operators.lsh import lsh_candidates
from deepblocker_spark.operators.topk import exact_topk_join


def brute_force_topk(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    max_broadcast_rows: int = 500_000,
) -> DataFrame:
    return exact_topk_join(
        df, df, k, l_id=id_col, r_id=id_col, emb_col=emb_col,
        exclude_self=exclude_self, max_broadcast_rows=max_broadcast_rows,
    )


def lsh_topk(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 1234,
) -> DataFrame:
    return lsh_candidates(
        df, id_col, emb_col, dim, k, n_bands, band_bits, seed
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Single row: |approx ∩ exact| / |exact| over (l_id, r_id) pairs."""
    a = approx.select("l_id", "r_id").dropDuplicates()
    e = exact.select("l_id", "r_id").dropDuplicates()
    hit = a.join(e, ["l_id", "r_id"]).agg(F.count("*").alias("hits"))
    tot = e.agg(F.count("*").alias("total"))
    return hit.crossJoin(tot).select(
        (F.col("hits") / F.col("total")).alias("recall_at_k"), "hits", "total"
    )

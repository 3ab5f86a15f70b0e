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


def _train_centroids(
    df: DataFrame, id_col: str, emb_col: str, n_cells: int, seed: int,
    sample_rows: int = 20_000, iters: int = 10,
):
    """Driver-side spherical k-means on a bounded sample (the IVF 'train'
    phase — centroids are a few KB and broadcast; the big table never leaves
    the executors)."""
    import numpy as np

    from deepblocker_spark.operators.topk import normalize_rows

    # Deterministic, partition-order-independent training sample (VERDICT
    # r1: a bare limit() made the sample depend on partition order): rank
    # rows by xxhash64(id) and keep the smallest `sample_rows`. The filter
    # keeps ~2x the target at scan cost, so only a tiny survivor set is
    # sorted — same shape as pipeline._sample_texts.
    from pyspark.sql import functions as F

    n = df.count()
    if n == 0:
        return np.zeros((0, 0))
    p = max(1, n // max(1, 2 * sample_rows))
    pdf = (
        df.select(F.col(emb_col).alias("_e"), F.xxhash64(F.col(id_col)).alias("_h"))
        .filter(F.pmod(F.col("_h"), F.lit(p)) == 0)
        .orderBy("_h")
        .limit(sample_rows)
        .toPandas()
    )
    x = normalize_rows(np.nan_to_num(np.stack(pdf["_e"].to_numpy()).astype(np.float64)))
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_topk(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 16,
    nprobe: int = 3,
    seed: int = 1234,
) -> DataFrame:
    """IVF-flat approximate top-k self-search: assign every vector to its
    nearest centroid cell, probe each query's ``nprobe`` closest cells, and
    search exactly within the probed cells. One shuffle on cell id; work per
    cell is bounded by cell size x probes — the standard ANN scale shape.

    -> (l_id, r_id, sim, rank), rank<=k per l_id, self-pairs excluded.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from deepblocker_spark.operators.topk import normalize_rows

    spark = df.sparkSession
    cents = _train_centroids(df, id_col, emb_col, n_cells, seed)
    cents_bc = spark.sparkContext.broadcast(cents)
    id_type = df.select(id_col).schema.fields[0].dataType

    # role 0 = index row (home cell only); role 1 = query row (nprobe cells)
    assign_schema = StructType(
        [
            StructField("_id", id_type, True),
            StructField("cell", IntegerType(), False),
            StructField("_role", IntegerType(), False),
            StructField("_emb", df.schema[emb_col].dataType, True),
        ]
    )

    def assign(batches):
        c = cents_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = normalize_rows(np.nan_to_num(np.stack(pdf[emb_col].to_numpy()).astype(np.float64)))
            sims = x @ c.T
            p = min(nprobe, sims.shape[1])
            probes = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            home = np.argmax(sims, axis=1)
            n = len(pdf)
            out_id, out_cell, out_role = [], [], []
            out_id.append(pdf[id_col].to_numpy())
            out_cell.append(home.astype(np.int32))
            out_role.append(np.zeros(n, dtype=np.int32))
            for j in range(p):
                out_id.append(pdf[id_col].to_numpy())
                out_cell.append(probes[:, j].astype(np.int32))
                out_role.append(np.ones(n, dtype=np.int32))
            frame = pd.DataFrame(
                {
                    "_id": np.concatenate(out_id),
                    "cell": np.concatenate(out_cell),
                    "_role": np.concatenate(out_role),
                }
            )
            frame["_emb"] = list(pdf[emb_col]) * (p + 1)
            yield frame

    assigned = df.select(id_col, emb_col).mapInPandas(assign, assign_schema)

    pair_schema = StructType(
        [
            StructField("l_id", id_type, True),
            StructField("r_id", id_type, True),
            StructField("sim", DoubleType(), False),
        ]
    )

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        queries = pdf[pdf["_role"] == 1]
        index = pdf[pdf["_role"] == 0]
        if not len(queries) or not len(index):
            return pd.DataFrame({"l_id": [], "r_id": [], "sim": []})
        qids = queries["_id"].to_numpy()
        iids = index["_id"].to_numpy()
        qx = normalize_rows(np.nan_to_num(np.stack(queries["_emb"].to_numpy()).astype(np.float64)))
        ix = normalize_rows(np.nan_to_num(np.stack(index["_emb"].to_numpy()).astype(np.float64)))
        sims = qx @ ix.T
        sims[qids[:, None] == iids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk] if kk < sims.shape[1] \
            else np.broadcast_to(np.arange(sims.shape[1]), sims.shape).copy()
        rows = np.repeat(np.arange(len(qids)), part.shape[1])
        cols = part.ravel()
        s = sims[rows, cols]
        keep = s > -np.inf
        return pd.DataFrame({"l_id": qids[rows[keep]], "r_id": iids[cols[keep]], "sim": s[keep]})

    pairs = (
        assigned.groupBy("cell")
        .applyInPandas(per_cell, pair_schema)
        .dropDuplicates(["l_id", "r_id"])
    )
    from pyspark.sql import functions as FF

    w = Window.partitionBy("l_id").orderBy(FF.desc("sim"), FF.asc("r_id"))
    return pairs.withColumn("rank", FF.row_number().over(w)).filter(FF.col("rank") <= k)


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Single row: |approx ∩ exact| / |exact| over (l_id, r_id) pairs."""
    a = approx.select("l_id", "r_id").dropDuplicates()
    e = exact.select("l_id", "r_id").dropDuplicates()
    hit = a.join(e, ["l_id", "r_id"]).agg(F.count("*").alias("hits"))
    tot = e.agg(F.count("*").alias("total"))
    return hit.crossJoin(tot).select(
        (F.col("hits") / F.col("total")).alias("recall_at_k"), "hits", "total"
    )

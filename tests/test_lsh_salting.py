"""Hot-bucket salt-splitting in LSH candidate generation."""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepblocker_spark.operators.lsh import lsh_candidates

DIM = 16


def test_lsh_hot_bucket_salting_bounds_tasks_and_keeps_recall(spark):
    """A pathological input where MANY near-identical vectors land in one
    bucket: with a small max_bucket_rows the mega-bucket must be split, the
    job must still complete, and each row must still find neighbors (its
    split-mates; the multi-band argument recovers the rest)."""
    rng = np.random.default_rng(31)
    center = rng.normal(size=DIM)
    hot = [(i, (center + rng.normal(scale=0.01, size=DIM)).astype(np.float32)) for i in range(200)]
    cold = [
        (1000 + i, rng.normal(size=DIM).astype(np.float32)) for i in range(40)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in hot + cold],
                      "embedding": [r[1] for r in hot + cold]})
    )
    out = lsh_candidates(
        df, dim=DIM, k=3, n_bands=6, band_bits=4, seed=3, max_bucket_rows=50
    ).toPandas()
    # every hot row finds hot neighbors despite the split
    hot_lids = set(out[out["l_id"] < 1000]["l_id"])
    assert len(hot_lids) == 200
    hot_pairs = out[(out["l_id"] < 1000)]
    assert (hot_pairs["r_id"] < 1000).mean() > 0.95
    assert (out["l_id"] != out["r_id"]).all()


def test_dyadic_hot_bucket_grid_split_no_recall_loss(spark):
    """VERDICT r1 #2: a bucket hotter than max_bucket_rows on BOTH sides
    must be grid salt-split, not truncated — the candidate set with a tiny
    cap must equal the uncapped candidate set, and recall vs the exact
    top-K join must be unchanged by the cap."""
    from deepblocker_spark.operators.lsh import lsh_candidates_dyadic
    from deepblocker_spark.operators.topk import exact_topk_join

    rng = np.random.default_rng(7)
    center = rng.normal(size=DIM)

    def side_df(n, id_start, seed):
        r = np.random.default_rng(seed)
        hot = [(id_start + i, (center + r.normal(scale=0.01, size=DIM)).astype(np.float32))
               for i in range(120)]
        cold = [(id_start + 1000 + i, r.normal(size=DIM).astype(np.float32))
                for i in range(30)]
        rows = hot + cold
        return spark.createDataFrame(
            pd.DataFrame({"id": [x[0] for x in rows], "embedding": [x[1] for x in rows]})
        )

    left = side_df(120, 0, 11)
    right = side_df(120, 10_000, 12)
    kwargs = dict(dim=DIM, k=5, n_bands=6, band_bits=4, seed=3)

    capped = lsh_candidates_dyadic(left, right, max_bucket_rows=30, **kwargs).toPandas()
    uncapped = lsh_candidates_dyadic(left, right, max_bucket_rows=10**9, **kwargs).toPandas()
    as_set = lambda pdf: set(zip(pdf["l_id"], pdf["r_id"]))
    assert as_set(capped) == as_set(uncapped)

    exact = exact_topk_join(left, right, k=5).toPandas()
    def recall(cand):
        return len(as_set(cand) & as_set(exact)) / len(exact)
    assert abs(recall(capped) - recall(uncapped)) < 1e-12
    assert recall(capped) > 0.8  # hot cluster is where the true matches are

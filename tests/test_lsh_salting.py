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

"""A/B: IVF-flat vs IVFADC (ivf_pq_topk) at the 240k-row scale input.

Same session, interleaved rounds (flat, pq, flat, pq) so both see the
same host phase; reports wall seconds, pair counts, and per-run shuffle
bytes (the transport claim under measurement: the IVFADC cell exchange
carries m-byte codes for the index role instead of 256-byte f32/f16
vectors). Deterministic clustered input, seeded.

Run: python tools/ivfpq_ab.py [rows] [rounds]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
DIM = 64
K = 10


def make_input(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.Generator(np.random.PCG64(99))
    n_clusters = 2_000
    centers = rng.normal(size=(n_clusters, DIM)).astype(np.float32)
    labels = rng.integers(0, n_clusters, size=ROWS)
    x = centers[labels] + 0.15 * rng.normal(size=(ROWS, DIM)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(ROWS, dtype=np.int64), "embedding": list(x)}
    )
    df = spark.createDataFrame(pdf).repartition(64).persist()
    df.count()
    return df


def main():
    from bench import _max_stage_id, _shuffle_since

    from deepblocker_spark.operators.ann import ivf_topk, release_assignment_caches
    from deepblocker_spark.operators.pq import ivf_pq_topk
    from deepblocker_spark.session import get_spark

    spark = get_spark(
        "ivfpq-ab", master="local[8]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},  # stage metrics REST API
    )
    df = make_input(spark)
    results = {"rows": ROWS, "dim": DIM, "k": K, "flat": [], "pq": []}

    def run(name, fn):
        marker = _max_stage_id(spark)
        t0 = time.monotonic()
        pairs = fn().count()
        dt = round(time.monotonic() - t0, 2)
        sh = _shuffle_since(spark, marker, detail=False)
        release_assignment_caches()
        rec = {"seconds": dt, "pairs": pairs,
               "shuffle_write": sh["shuffle_write"], "input": sh["input"]}
        results[name].append(rec)
        print(f"# {name}: {rec}", file=sys.stderr)

    for _ in range(ROUNDS):
        run("flat", lambda: ivf_topk(
            df, k=K, id_col="vec_id", emb_col="embedding",
            nprobe=4, seed=7, rows_hint=ROWS))
        run("pq", lambda: ivf_pq_topk(
            df, k=K, id_col="vec_id", emb_col="embedding",
            nprobe=4, m=8, n_codes=256, seed=7, rows_hint=ROWS))

    best_flat = min(r["seconds"] for r in results["flat"])
    best_pq = min(r["seconds"] for r in results["pq"])
    results["speedup_pq_vs_flat"] = round(best_flat / best_pq, 3)
    results["shuffle_ratio_flat_over_pq"] = round(
        results["flat"][0]["shuffle_write"]
        / max(1, results["pq"][0]["shuffle_write"]), 2,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()

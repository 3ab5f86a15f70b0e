"""Sequence packing: validity (partition of docs, budget respected),
determinism, oversized handling, FFD quality vs the LB, and the
packing_summary derived-property reduction."""
from __future__ import annotations

import math

from deepblocker_spark.operators.packing import pack_sequences, packing_summary

BUDGET = 1000


def _mkdf(spark, toks):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )


def test_pack_validity_and_quality(spark):
    # deterministic pseudo-random sizes in [50, 800]
    toks = [50 + (i * 7919) % 751 for i in range(500)]
    df = _mkdf(spark, toks)
    out = pack_sequences(df, BUDGET, n_groups=8).collect()
    assert len(out) == 500
    assert {r.doc_id for r in out} == set(range(500))
    assert not any(r.oversized for r in out)
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r.n_tokens)
    assert all(sum(v) <= BUDGET for v in by_bin.values())
    lb = math.ceil(sum(toks) / BUDGET)
    # FFD with 8 groups stays close to the global lower bound
    assert lb <= len(by_bin) <= math.ceil(lb * 11 / 9) + 3 * 8
    # determinism
    again = pack_sequences(df, BUDGET, n_groups=8).collect()
    assert {(r.doc_id, r.bin_id) for r in again} == {
        (r.doc_id, r.bin_id) for r in out
    }


def test_oversized_are_flagged_singletons(spark):
    df = _mkdf(spark, [100, 2500, 300, 1001])
    out = pack_sequences(df, BUDGET, n_groups=2).collect()
    over = [r for r in out if r.oversized]
    assert {r.doc_id for r in over} == {1, 3}  # 2500 and 1001
    # oversized docs sit alone in their bins
    bins_of_over = {r.bin_id for r in over}
    assert all(
        r.oversized for r in out if r.bin_id in bins_of_over
    )
    ok = [r for r in out if not r.oversized]
    assert {r.doc_id for r in ok} == {0, 2}


def test_packing_summary_ok_and_detects_violations(spark):
    toks = [50 + (i * 31) % 900 for i in range(200)] + [5000]
    df = _mkdf(spark, toks)
    packed = pack_sequences(df, BUDGET, n_groups=4)
    row = packing_summary(packed, BUDGET, n_groups=4).collect()[0]
    assert row.pack_ok == 1
    assert row.n_docs == 201
    # a corrupted packing (two oversized docs forced into one bin) fails
    from pyspark.sql import functions as F

    bad = packed.withColumn(
        "bin_id", F.when(F.col("oversized"), F.lit(0)).otherwise(F.col("bin_id"))
    )
    # put a normal doc in bin 0 too so the oversized-singleton rule breaks
    bad = bad.withColumn(
        "bin_id", F.when(F.col("doc_id") == 0, F.lit(0)).otherwise(F.col("bin_id"))
    )
    assert packing_summary(bad, BUDGET, n_groups=4).collect()[0].pack_ok == 0


def test_quantile_bands_match_numpy(spark):
    import numpy as np

    from deepblocker_spark.operators.textstats import quantile_bands

    scores = [(i, (i * 131) % 997) for i in range(400)]
    df = spark.createDataFrame(scores, "doc_id long, score long")
    rows = quantile_bands(df, "score", n_bands=4).collect()
    vals = np.array([s for _, s in scores])
    bounds = np.percentile(vals, [25, 50, 75])  # linear interpolation
    for r in rows:
        exp = 1 + int(r.score > bounds[0]) + int(r.score > bounds[1]) + int(
            r.score > bounds[2]
        )
        assert r.band == exp, (r.doc_id, r.score)
    # quartiles are roughly balanced
    from collections import Counter

    c = Counter(r.band for r in rows)
    assert set(c) == {1, 2, 3, 4}
    assert all(60 <= v <= 140 for v in c.values()), c


def test_pack_property_random_sizes(spark):
    """Hypothesis-style randomized validity sweep (seeded, incl. zeros,
    budget-exact and oversized sizes): the packing is always an exact
    partition with every non-oversized bin within budget."""
    import random

    rng = random.Random(17)
    for trial in range(3):
        toks = [
            rng.choice([0, 1, BUDGET, BUDGET - 1, BUDGET + 1,
                        rng.randrange(0, 3 * BUDGET)])
            for _ in range(150)
        ]
        df = _mkdf(spark, toks)
        out = pack_sequences(df, BUDGET, n_groups=3).collect()
        assert len(out) == 150 and len({r.doc_id for r in out}) == 150
        by_bin: dict = {}
        for r in out:
            by_bin.setdefault(r.bin_id, []).append(r)
        for rows in by_bin.values():
            if any(r.oversized for r in rows):
                assert len(rows) == 1 and rows[0].n_tokens > BUDGET
            else:
                assert sum(r.n_tokens for r in rows) <= BUDGET
        ok = packing_summary(
            pack_sequences(df, BUDGET, n_groups=3), BUDGET, n_groups=3
        ).collect()[0]
        assert ok.pack_ok == 1, toks[:20]

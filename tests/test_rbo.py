"""Rank-biased overlap vs a pure-Python prefix-agreement brute force."""

from __future__ import annotations

import pytest

from deepblocker_spark.operators.metrics import rank_biased_overlap


def brute_rbo(la, lb, k, p=0.9):
    sa, sb = set(), set()
    total = 0.0
    for d in range(1, k + 1):
        if d <= len(la):
            sa.add(la[d - 1])
        if d <= len(lb):
            sb.add(lb[d - 1])
        total += p ** (d - 1) * len(sa & sb) / d
    return (1 - p) / (1 - p**k) * total


def _frame(spark, rankings):
    rows = [
        (qid, doc, r + 1)
        for qid, docs in rankings.items()
        for r, doc in enumerate(docs)
    ]
    return spark.createDataFrame(rows, "qid long, id long, rank int")


def test_rbo_matches_brute_force(spark):
    a = {1: [10, 11, 12, 13], 2: [20, 21, 22], 3: [30, 31], 5: [50],
         6: [60, 61, 62, 63]}
    b = {1: [11, 10, 12, 14], 2: [25, 26, 27], 3: [30, 31], 4: [40],
         6: [60, 61, 62, 63]}
    got = {
        r.qid: r.rbo
        for r in rank_biased_overlap(
            _frame(spark, a), _frame(spark, b), k=4, p=0.9
        ).collect()
    }
    # identical FULL-DEPTH rankings -> exactly 1.0; identical SHORT lists
    # (query 3, 2 of 4 ranks) score < 1 under truncated RBO (agreement at
    # depths past the list length is |list|/d — the standard RBO_min
    # penalty); disjoint -> 0.0; one-sided queries (4, 5) present at 0.0
    assert got[6] == pytest.approx(1.0)
    assert 0 < got[3] < 1
    assert got[2] == 0.0
    assert got[4] == 0.0 and got[5] == 0.0
    for qid in (1, 2, 3, 6):
        assert got[qid] == pytest.approx(
            brute_rbo(a.get(qid, []), b.get(qid, []), k=4), abs=1e-9
        )
    # top-weighting: swapping ranks 1/2 (query 1) costs more at small p
    lo = rank_biased_overlap(_frame(spark, a), _frame(spark, b), k=4, p=0.5)
    lo1 = {r.qid: r.rbo for r in lo.collect()}[1]
    assert lo1 < got[1]
    assert lo1 == pytest.approx(brute_rbo(a[1], b[1], k=4, p=0.5), abs=1e-9)


def test_rbo_validation(spark):
    f = _frame(spark, {1: [10]})
    with pytest.raises(ValueError, match="k must be"):
        rank_biased_overlap(f, f, k=0)
    with pytest.raises(ValueError, match="p must be"):
        rank_biased_overlap(f, f, k=3, p=1.0)

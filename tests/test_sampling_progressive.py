"""stratified_hash_sample (exact row-set cross-check vs hashlib.md5) and
progressive_pairs (best-first budget emission + TakeOrdered plan)."""
from __future__ import annotations

import hashlib

import pytest

from deepblocker_spark.operators.metablocking import progressive_pairs
from deepblocker_spark.operators.sampling import (
    rate_to_cutoff,
    stratified_hash_sample,
)


def test_rate_to_cutoff():
    assert rate_to_cutoff(0.0) == "000000"
    assert rate_to_cutoff(1.0) == "g"
    assert rate_to_cutoff(2.0) == "g"
    assert rate_to_cutoff(0.25) == "400000"
    assert rate_to_cutoff(0.5, digits=2) == "80"
    with pytest.raises(ValueError):
        rate_to_cutoff(-0.1)


def _expected_ids(ids, rate, digits=6):
    cut = rate_to_cutoff(rate, digits)
    return {
        i
        for i in ids
        if hashlib.md5(str(i).encode()).hexdigest()[:digits] < cut
    }


def test_sample_matches_hashlib_exactly(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, grp string")
    rates = {"a": 0.3, "b": 0.8}
    got = {
        (r.id, r.grp)
        for r in stratified_hash_sample(df, ["grp"], rates, "id").collect()
    }
    exp = set()
    for i, g in rows:
        if i in _expected_ids([i], rates[g]):
            exp.add((i, g))
    assert got == exp
    # deterministic: a second run returns the identical row set
    again = {
        (r.id, r.grp)
        for r in stratified_hash_sample(df, ["grp"], rates, "id").collect()
    }
    assert again == got
    # rates are roughly honored (md5 uniformity, wide tolerance)
    n_a = sum(1 for i, g in got if g == "a")
    n_b = sum(1 for i, g in got if g == "b")
    assert 0.15 * 200 <= n_a <= 0.45 * 200
    assert 0.65 * 200 <= n_b <= 0.95 * 200


def test_sample_rate_one_and_missing_stratum(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i < 5 else "drop") for i in range(10)],
        "id long, grp string",
    )
    out = stratified_hash_sample(df, ["grp"], {"keep": 1.0}, "id").collect()
    assert {r.id for r in out} == set(range(5))  # rate 1 keeps all
    # stratum absent from rates is dropped entirely
    assert all(r.grp == "keep" for r in out)


def test_sample_tuple_strata_and_validation(spark):
    df = spark.createDataFrame(
        [(i, "x", "y") for i in range(8)], "id long, c1 string, c2 string"
    )
    out = stratified_hash_sample(
        df, ["c1", "c2"], {("x", "y"): 1.0}, "id"
    ).collect()
    assert len(out) == 8
    with pytest.raises(ValueError):
        stratified_hash_sample(df, ["c1", "c2"], {"x": 1.0}, "id")
    with pytest.raises(ValueError):
        stratified_hash_sample(df, ["c1"], {}, "id")


def test_progressive_budget_and_tiebreak(spark):
    # scores with a tie group at the boundary: deterministic (score desc,
    # a, b) order decides which tied pair makes the budget
    rows = [
        (1, 2, 0.9),
        (1, 3, 0.5),
        (2, 3, 0.5),
        (1, 4, 0.5),
        (3, 4, 0.1),
    ]
    df = spark.createDataFrame(rows, "a long, b long, weight double")
    out = progressive_pairs(df, budget=3).collect()
    assert [(r.a, r.b, r.rank) for r in out] == [
        (1, 2, 1),
        (1, 3, 2),  # ties 0.5: (1,3) < (1,4) < (2,3)
        (1, 4, 3),
    ]
    # budget >= |set|: everything emitted, ranks complete
    full = progressive_pairs(df, budget=100).collect()
    assert len(full) == 5
    assert [r.rank for r in sorted(full, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]


def test_progressive_plan_is_take_ordered(spark):
    # the budget must compile to TakeOrderedAndProject (bounded heaps),
    # never a global Sort exchange over the full pair set
    df = spark.createDataFrame(
        [(i, i + 1, float(i % 7)) for i in range(100)],
        "a long, b long, weight double",
    )
    plan = (
        df.select("a", "b", "weight")
        .orderBy("weight", ascending=False)
        .limit(10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan

"""Fellegi-Sunter linkage — EM checked against planted parameters on an
EXACT expected-count contingency table (the planted model is then the
global optimum, so recovery must be near-exact), scoring checked against
hand-computed Bayes factors, and the end-to-end unsupervised pipeline
checked on a seeded duplicate-corruption dataset with a precision/recall
gate."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepblocker_spark.operators.linkage import (
    Comparison,
    FSParams,
    comparison_vectors,
    fs_em,
    fs_link,
    match_probability_col,
    match_weight_col,
    pattern_counts,
    score_pairs,
    term_frequencies,
    tf_adjusted_scores,
)


def _comps():
    # levels 2 / 2 / 3 — driver-side EM needs no gamma expressions
    return [Comparison("x", 2), Comparison("y", 2), Comparison("z", 3)]


PLANTED = FSParams(
    lam=0.25,
    m={"x": [0.15, 0.85], "y": [0.3, 0.7], "z": [0.05, 0.2, 0.75]},
    u={"x": [0.9, 0.1], "y": [0.75, 0.25], "z": [0.7, 0.25, 0.05]},
)


def _exact_pattern_table(params: FSParams, comps, total=1_000_000.0):
    """Expected counts under the mixture — EM on these has the planted
    parameters as its optimum (no sampling noise)."""
    rows = []
    for combo in itertools.product(*[range(c.levels) for c in comps]):
        pm = params.lam
        pu = 1.0 - params.lam
        for c, lvl in zip(comps, combo):
            pm *= params.m[c.name][lvl]
            pu *= params.u[c.name][lvl]
        rows.append(
            {**{c.col: lvl for c, lvl in zip(comps, combo)},
             "n_pairs": total * (pm + pu)}
        )
    return pd.DataFrame(rows)


def test_em_recovers_planted_parameters():
    comps = _comps()
    pats = _exact_pattern_table(PLANTED, comps)
    got = fs_em(pats, comps, max_iter=2000, tol=1e-12)
    assert got.converged
    assert got.lam == pytest.approx(PLANTED.lam, abs=1e-4)
    for c in comps:
        np.testing.assert_allclose(got.m[c.name], PLANTED.m[c.name], atol=1e-4)
        np.testing.assert_allclose(got.u[c.name], PLANTED.u[c.name], atol=1e-4)


def test_em_loglik_monotone_nondecreasing():
    comps = _comps()
    # sampled (not exact) counts -> a rough surface, but EM's guarantee holds
    rng = np.random.default_rng(7)
    pats = _exact_pattern_table(PLANTED, comps, total=500.0)
    pats["n_pairs"] = rng.poisson(pats["n_pairs"].to_numpy()) + 1
    got = fs_em(pats, comps, max_iter=300, tol=0.0)  # run all iterations
    ll = np.array(got.loglik)
    assert (np.diff(ll) >= -1e-9).all()


def test_em_rejects_out_of_range_gamma_and_empty():
    comps = _comps()
    with pytest.raises(ValueError, match="empty"):
        fs_em(pd.DataFrame(columns=["gamma_x", "gamma_y", "gamma_z", "n_pairs"]),
              comps)
    pats = _exact_pattern_table(PLANTED, comps)
    pats.loc[0, "gamma_z"] = 9
    with pytest.raises(ValueError, match="gamma_z"):
        fs_em(pats, comps)


def test_score_pairs_hand_computed(spark):
    comps = [Comparison("x", 2), Comparison("z", 3)]
    params = FSParams(
        lam=0.2,
        m={"x": [0.1, 0.9], "z": [0.1, 0.3, 0.6]},
        u={"x": [0.8, 0.2], "z": [0.6, 0.3, 0.1]},
    )
    gam = spark.createDataFrame(
        [(1, 2, 1, 2), (3, 4, 0, 0)], "a long, b long, gamma_x int, gamma_z int"
    )
    rows = {(r.a, r.b): r for r in score_pairs(gam, comps, params).collect()}
    # pair (1,2): K = (0.9/0.2) * (0.6/0.1)
    k12 = (0.9 / 0.2) * (0.6 / 0.1)
    w12 = math.log2(0.9 / 0.2) + math.log2(0.6 / 0.1)
    p12 = 0.2 * k12 / (0.2 * k12 + 0.8)
    assert rows[(1, 2)].match_weight == pytest.approx(w12, rel=1e-12)
    assert rows[(1, 2)].match_probability == pytest.approx(p12, rel=1e-12)
    k34 = (0.1 / 0.8) * (0.1 / 0.6)
    p34 = 0.2 * k34 / (0.2 * k34 + 0.8)
    assert rows[(3, 4)].match_probability == pytest.approx(p34, rel=1e-12)
    assert rows[(3, 4)].match_weight < 0 < rows[(1, 2)].match_weight


def test_comparison_vectors_null_safe_and_counts(spark):
    pairs = spark.createDataFrame(
        [(1, 2, "a", "a", 5), (3, 4, None, "b", 40), (5, 6, "c", "d", None)],
        "a long, b long, ls string, rs string, diff int",
    )
    comps = [
        Comparison(
            "src", 2,
            F.when(F.col("ls").eqNullSafe(F.col("rs")), 1).otherwise(0),
        ),
        Comparison(
            "len", 3,
            F.when(F.col("diff") <= 10, 2)
            .when(F.col("diff") <= 50, 1)
            .otherwise(0),
        ),
    ]
    gam = comparison_vectors(pairs, comps)
    got = {(r.a, r.b): (r.gamma_src, r.gamma_len) for r in gam.collect()}
    # NULL name -> disagree level 0; NULL diff -> otherwise() branch 0
    assert got == {(1, 2): (1, 2), (3, 4): (0, 1), (5, 6): (0, 0)}
    pats = pattern_counts(gam, comps).toPandas()
    assert int(pats["n_pairs"].sum()) == 3
    assert len(pats) == 3


def test_term_frequencies_excludes_nulls(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), (None,)], "v string"
    )
    got = {r.value: r.tf for r in term_frequencies(df, "v").collect()}
    # NULL row excluded from numerator AND denominator: N = 4
    assert got == {"a": pytest.approx(0.75), "b": pytest.approx(0.25)}


def test_tf_adjusted_scores_hand_computed(spark):
    comps = [Comparison("src", 2), Comparison("z", 3)]
    params = FSParams(
        lam=0.2,
        m={"src": [0.1, 0.9], "z": [0.1, 0.3, 0.6]},
        u={"src": [0.8, 0.2], "z": [0.6, 0.3, 0.1]},
    )
    # (a, b, gamma_src, gamma_z, tf): agreeing pair on a rare value
    # (tf=0.05 < u_agree=0.2 -> boost 4x), agreeing pair on a common value
    # (tf=0.5 -> shrink 0.4x), agreeing pair with UNKNOWN tf (left-join
    # miss -> factor 1), and a disagreeing pair (factor 1 regardless of tf)
    gam = spark.createDataFrame(
        [
            (1, 2, 1, 2, 0.05),
            (3, 4, 1, 2, 0.5),
            (5, 6, 1, 2, None),
            (7, 8, 0, 0, 0.05),
        ],
        "a long, b long, gamma_src int, gamma_z int, tf double",
    )
    out = tf_adjusted_scores(gam, comps, params, {"src": F.col("tf")})
    rows = {(r.a, r.b): r for r in out.collect()}

    def post(k):
        return 0.2 * k / (0.2 * k + 0.8)

    k_agree = (0.9 / 0.2) * (0.6 / 0.1)
    assert rows[(1, 2)].tf_factor == pytest.approx(0.2 / 0.05, rel=1e-12)
    assert rows[(1, 2)].match_probability == pytest.approx(post(k_agree))
    assert rows[(1, 2)].adj_match_probability == pytest.approx(
        post(k_agree * 4.0), rel=1e-12
    )
    assert rows[(3, 4)].tf_factor == pytest.approx(0.2 / 0.5, rel=1e-12)
    assert rows[(3, 4)].adj_match_probability == pytest.approx(
        post(k_agree * 0.4), rel=1e-12
    )
    # unknown tf and disagreement both leave the score unadjusted
    for key in [(5, 6), (7, 8)]:
        assert rows[key].tf_factor == pytest.approx(1.0)
        assert rows[key].adj_match_probability == pytest.approx(
            rows[key].match_probability, rel=1e-12
        )
    # rare-value agreement must outrank common-value agreement
    assert (
        rows[(1, 2)].adj_match_probability
        > rows[(1, 2)].match_probability
        > rows[(3, 4)].adj_match_probability
    )


def test_tf_adjusted_scores_min_tf_floor_and_validation(spark):
    comps = [Comparison("src", 2)]
    params = FSParams(lam=0.5, m={"src": [0.1, 0.9]}, u={"src": [0.8, 0.2]})
    gam = spark.createDataFrame(
        [(1, 2, 1, 0.001)], "a long, b long, gamma_src int, tf double"
    )
    out = tf_adjusted_scores(
        gam, comps, params, {"src": F.col("tf")}, min_tf=0.01
    ).collect()[0]
    # floor kicks in: factor = u_agree / max(tf, 0.01) = 0.2 / 0.01 = 20
    assert out.tf_factor == pytest.approx(20.0, rel=1e-12)
    with pytest.raises(ValueError, match="unknown comparisons"):
        tf_adjusted_scores(gam, comps, params, {"nope": F.col("tf")})


def _dupe_dataset(rng, n_entities=300, dup_rate=0.35):
    """Entities with (name, city, year); a seeded fraction get a duplicate
    with field corruptions. Returns records + the true duplicate pair set."""
    cities = [f"city{i}" for i in range(12)]
    recs, truth = [], set()
    rid = 0
    for e in range(n_entities):
        name = f"name{e:04d}"
        city = cities[int(rng.integers(len(cities)))]
        year = int(1950 + rng.integers(60))
        base = rid
        recs.append((rid, e, name, city, year))
        rid += 1
        if rng.random() < dup_rate:
            nm = name if rng.random() < 0.8 else name[:-1] + "x"
            ct = city if rng.random() < 0.7 else cities[int(rng.integers(len(cities)))]
            yr = year if rng.random() < 0.75 else year + int(rng.integers(1, 4))
            recs.append((rid, e, nm, ct, yr))
            truth.add((base, rid))
            rid += 1
    return recs, truth


def test_fs_link_end_to_end_unsupervised(spark):
    rng = np.random.default_rng(11)
    recs, truth = _dupe_dataset(rng)
    df = spark.createDataFrame(
        recs, "rid long, ent long, name string, city string, year int"
    )
    # blocking: same 6-char name prefix (keeps true dupes together, admits
    # same-prefix non-matches as the U population)
    lhs = df.select(
        F.col("rid").alias("a"), F.col("name").alias("ln"),
        F.col("city").alias("lc"), F.col("year").alias("ly"),
        F.substring("name", 1, 6).alias("bk"),
    )
    rhs = df.select(
        F.col("rid").alias("b"), F.col("name").alias("rn"),
        F.col("city").alias("rc"), F.col("year").alias("ry"),
        F.substring("name", 1, 6).alias("bk"),
    )
    pairs = lhs.join(rhs, "bk").filter(F.col("a") < F.col("b"))
    comps = [
        Comparison("name", 2,
                   F.when(F.col("ln").eqNullSafe(F.col("rn")), 1).otherwise(0)),
        Comparison("city", 2,
                   F.when(F.col("lc").eqNullSafe(F.col("rc")), 1).otherwise(0)),
        Comparison("year", 3,
                   F.when(F.col("ly") == F.col("ry"), 2)
                   .when(F.abs(F.col("ly") - F.col("ry")) <= 3, 1)
                   .otherwise(0)),
    ]
    # EM on a lam ~ 0.003 candidate set converges slowly (observed ~560
    # iterations at tol 1e-7) — iterations are over an 11-row table
    scored, params = fs_link(pairs, comps, max_iter=1000, tol=1e-7)
    assert params.converged
    # the match class must concentrate agreement: m(top) > u(top) per field
    for c in comps:
        assert params.m[c.name][-1] > params.u[c.name][-1]
    pred = {
        (r.a, r.b)
        for r in scored.filter(F.col("match_probability") > 0.5)
        .select("a", "b").collect()
    }
    tp = len(pred & truth)
    precision = tp / max(len(pred), 1)
    recall = tp / len(truth)
    # name-corrupted dupes carry too little evidence at lam ~ 0.003 (their
    # Bayes factor can't overcome the prior) — the DECISION model is right
    # to rank them below 0.5, so the hard recall gate applies to the
    # identifiable (name-equal) subset; overall recall gets a floor.
    name_of = {r[0]: r[2] for r in recs}
    identifiable = {t for t in truth if name_of[t[0]] == name_of[t[1]]}
    tp_ident = len(pred & identifiable)
    assert precision >= 0.9, (precision, recall)
    assert tp_ident / len(identifiable) >= 0.95, (precision, recall)
    assert recall >= 0.6, (precision, recall)

"""Otsu threshold selection (metrics.otsu_cut) — checked against an
independent numpy Otsu on a planted bimodal score distribution, plus the
exactness disciplines (integer moments, smallest-bin tie-break, degenerate
single-value input)."""

from __future__ import annotations

import numpy as np
import pytest

from deepblocker_spark.operators.metrics import otsu_cut


def _numpy_otsu(values: np.ndarray, bins: int):
    """Plain-python Otsu over bin indices (the operator's contract):
    returns (winning bin, dict bin -> between-class variance)."""
    lo, hi = float(values.min()), float(values.max())
    width = (hi - lo) / bins
    idx = np.minimum(bins - 1, np.floor((values - lo) / width).astype(int))
    uniq, counts = np.unique(idx, return_counts=True)
    n_total = counts.sum()
    wsum_total = (counts * uniq).sum()
    cum_n = np.cumsum(counts)
    cum_w = np.cumsum(counts * uniq)
    variances = {}
    for i, b in enumerate(uniq):
        if cum_n[i] == n_total:
            continue
        w0 = cum_n[i] / n_total
        mu0 = cum_w[i] / cum_n[i]
        mu1 = (wsum_total - cum_w[i]) / (n_total - cum_n[i])
        variances[int(b)] = w0 * (1 - w0) * (mu0 - mu1) ** 2
    best = min(
        (b for b, v in variances.items() if v == max(variances.values()))
    )
    return best, variances, lo, width, dict(zip(uniq.tolist(), counts.tolist()))


def test_otsu_recovers_planted_bimodal_cut(spark):
    rng = np.random.default_rng(3)
    low = rng.normal(-8.0, 1.5, 4000)   # non-match weights
    high = rng.normal(9.0, 2.0, 600)    # match weights
    vals = np.concatenate([low, high])
    df = spark.createDataFrame([(float(v),) for v in vals], "w double")
    out = otsu_cut(df, score_col="w", bins=64).collect()
    exp_bin, exp_var, lo, width, exp_counts = _numpy_otsu(vals, 64)

    rows = {r.bin: r for r in out}
    assert {b: r.n_pairs for b, r in rows.items()} == exp_counts
    winner = [r for r in out if r.is_otsu]
    assert len(winner) == 1
    assert winner[0].bin == exp_bin
    assert winner[0].threshold == pytest.approx(
        lo + (exp_bin + 1) * width, rel=1e-9
    )
    # the chosen score-space cut must actually separate the two modes
    assert -6.0 < winner[0].threshold < 7.0
    for b, v in exp_var.items():
        assert rows[b].var_between == pytest.approx(v, abs=1e-9)
    # non-winning rows carry no threshold; the full-mass row has no cut
    assert all(r.threshold is None for r in out if not r.is_otsu)
    last = max(rows)
    assert rows[last].var_between is None
    # exact integer moments: cumulative sums reconstruct the counts
    ordered = [rows[b] for b in sorted(rows)]
    assert ordered[-1].cum_n == len(vals)
    assert [r.cum_n for r in ordered] == list(
        np.cumsum([r.n_pairs for r in ordered])
    )


def test_otsu_explicit_range_and_degenerate(spark):
    # explicit lo/hi: values land in predictable bins
    df = spark.createDataFrame(
        [(0.5,)] * 10 + [(9.5,)] * 10, "w double"
    )
    out = {r.bin: r for r in otsu_cut(df, "w", bins=10, lo=0.0, hi=10.0).collect()}
    assert set(out) == {0, 9}
    assert out[0].n_pairs == out[9].n_pairs == 10
    assert out[0].is_otsu and out[0].threshold == pytest.approx(1.0)
    # all-equal input: single bin, no valid cut, nothing crashes
    deg = otsu_cut(
        spark.createDataFrame([(2.0,)] * 5, "w double"), "w", bins=8
    ).collect()
    assert len(deg) == 1
    assert deg[0].bin == 0 and deg[0].var_between is None


def test_unsupervised_end_to_end_em_plus_otsu(spark):
    """The label-free decision loop closed end to end: EM learns the m/u
    parameters (fs_link), Otsu picks the match-weight cut from the score
    histogram alone, connected components turn the accepted pairs into
    entities — no label and no hand-chosen threshold anywhere.

    The cut runs on the POSTERIOR (match_probability), not the raw weight:
    at lam ~ 0.003 the non-match class carries ~99.7% of the mass AND a
    raw-weight spread comparable to the inter-mode gap, so unweighted
    between-class variance maximization cuts inside the big mode (measured:
    threshold -20.9, precision 0.004). The sigmoid squashes the non-match
    spread to ~0 while keeping the modes ~1 apart, which is exactly the
    geometry Otsu assumes — the standard practitioner's transform for
    imbalanced score histograms. Gates are deliberately looser than the
    supervised 0.5-posterior test in test_linkage.py."""
    import numpy as np
    from pyspark.sql import functions as F

    from deepblocker_spark.operators.cluster import connected_components
    from deepblocker_spark.operators.linkage import Comparison, fs_link
    from deepblocker_spark.operators.metrics import pairwise_f1
    from tests.test_linkage import _dupe_dataset

    rng = np.random.default_rng(11)
    recs, truth = _dupe_dataset(rng)
    df = spark.createDataFrame(
        recs, "rid long, ent long, name string, city string, year int"
    )
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
    scored, params = fs_link(pairs, comps, max_iter=1000, tol=1e-7)
    assert params.converged
    cut = [r for r in otsu_cut(scored, "match_probability", bins=32).collect()
           if r.is_otsu]
    assert len(cut) == 1
    thr = cut[0].threshold
    # the cut must separate the disagree-everything mode from the
    # agree-on-name mode: strictly between the posterior extremes
    lo, hi = scored.agg(
        F.min("match_probability"), F.max("match_probability")
    ).first()
    assert lo < thr < hi
    accepted = scored.filter(
        F.col("match_probability") >= thr
    ).select("a", "b")
    comp = connected_components(accepted, src="a", dst="b")
    clustered = (
        comp.alias("x")
        .join(comp.alias("y"), F.col("x.component") == F.col("y.component"))
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
    )
    gold = spark.createDataFrame(sorted(truth), "a long, b long")
    m = pairwise_f1(clustered, gold, l_col="a", r_col="b").first()
    assert m.precision >= 0.9, (thr, m)
    assert m.recall >= 0.6, (thr, m)

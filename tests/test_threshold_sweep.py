"""PR-curve threshold sweep — checked against a driver-side recomputation,
including empty cuts, direction normalization, and duplicate scored pairs."""

from __future__ import annotations

from deepblocker_spark.operators.metrics import threshold_sweep

SCORED = [
    # (l, r, sim) — includes a reversed duplicate with lower sim (max wins)
    (1, 2, 0.95),
    (2, 1, 0.80),
    (3, 4, 0.75),
    (5, 6, 0.40),
    (7, 8, 0.99),
    (9, 10, 0.10),
]
GOLDEN = [(2, 1), (3, 4), (11, 12)]  # (1,2) listed reversed; (11,12) unscored
THRESHOLDS = [0.0, 0.5, 0.9, 0.97, 1.0]


def _python_sweep():
    best = {}
    for l, r, s in SCORED:
        k = (min(l, r), max(l, r))
        best[k] = max(best.get(k, 0.0), s)
    gold = {(min(a, b), max(a, b)) for a, b in GOLDEN}
    out = {}
    for t in THRESHOLDS:
        pred = {k for k, s in best.items() if s >= t}
        tp = len(pred & gold)
        n_pred, n_gold = len(pred), len(gold)
        out[t] = (
            n_pred, tp, n_gold,
            round(tp / n_pred, 9) if n_pred else None,
            round(tp / n_gold, 9) if n_gold else None,
            round(2 * tp / (n_pred + n_gold), 9) if n_pred + n_gold else None,
        )
    return out


def test_threshold_sweep_matches_recomputation(spark):
    scored = spark.createDataFrame(SCORED, "l_id long, r_id long, sim double")
    golden = spark.createDataFrame(GOLDEN, "ltable_id long, rtable_id long")
    got = {
        r["threshold"]: (
            r["n_pred"], r["tp"], r["n_gold"],
            r["precision"], r["recall"], r["f1"],
        )
        for r in threshold_sweep(scored, golden, THRESHOLDS).collect()
    }
    assert got == _python_sweep()
    # threshold 1.0 clears nothing -> zero counts present, precision NULL
    assert got[1.0][0] == 0 and got[1.0][3] is None

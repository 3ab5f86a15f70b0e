"""clustering_eval (B-cubed / Rand / ARI) and group_linkage — verified
against an independent pure-python reference implementation (itertools
over explicit pairs / per-item overlap counts), not against a
re-derivation of the same contingency algebra."""
from __future__ import annotations

import itertools
import random

import pytest

from deepblocker_spark.operators.cluster import group_linkage
from deepblocker_spark.operators.metrics import clustering_eval


def _py_bcubed(assign: dict[int, tuple]) -> tuple[float, float, float]:
    """Literal per-item B-cubed: for each item, overlap of its predicted
    cluster with its gold cluster, averaged."""
    ids = list(assign)
    p_members: dict = {}
    g_members: dict = {}
    for i, (pc, gc) in assign.items():
        p_members.setdefault(pc, set()).add(i)
        g_members.setdefault(gc, set()).add(i)
    ps, rs = [], []
    for i, (pc, gc) in assign.items():
        inter = len(p_members[pc] & g_members[gc])
        ps.append(inter / len(p_members[pc]))
        rs.append(inter / len(g_members[gc]))
    P = sum(ps) / len(ids)
    R = sum(rs) / len(ids)
    return P, R, 2 * P * R / (P + R)


def _py_rand(assign: dict[int, tuple]) -> tuple[float, float]:
    """Literal pair-counting Rand / adjusted Rand over explicit pairs."""
    ids = sorted(assign)
    a = b = c = d = 0  # same-same, same-diff, diff-same, diff-diff
    for i, j in itertools.combinations(ids, 2):
        sp = assign[i][0] == assign[j][0]
        sg = assign[i][1] == assign[j][1]
        if sp and sg:
            a += 1
        elif sp:
            b += 1
        elif sg:
            c += 1
        else:
            d += 1
    n = a + b + c + d
    ri = (a + d) / n
    # ARI from the same pair counts: (a - exp) / (max - exp)
    exp = (a + b) * (a + c) / n
    mx = ((a + b) + (a + c)) / 2
    ari = (a - exp) / (mx - exp) if mx != exp else None
    return ri, ari


def _py_vmeasure(assign: dict[int, tuple]) -> tuple[float, float, float]:
    """Literal entropy-based homogeneity/completeness/V (natural log)."""
    import math
    from collections import Counter

    n = len(assign)
    pc = Counter(p for p, _ in assign.values())
    gc = Counter(g for _, g in assign.values())
    joint = Counter(assign.values())
    h_pred = -sum(c / n * math.log(c / n) for c in pc.values())
    h_gold = -sum(c / n * math.log(c / n) for c in gc.values())
    h_g_p = -sum(
        c / n * math.log(c / pc[p]) for (p, g), c in joint.items()
    )
    h_p_g = -sum(
        c / n * math.log(c / gc[g]) for (p, g), c in joint.items()
    )
    h = 1 - h_g_p / h_gold if h_gold > 1e-12 else 1.0
    c = 1 - h_p_g / h_pred if h_pred > 1e-12 else 1.0
    v = 2 * h * c / (h + c) if h + c > 0 else 0.0
    return h, c, v


def _run(spark, assign: dict[int, tuple]):
    pred = spark.createDataFrame(
        [(i, pc) for i, (pc, _) in assign.items()], "id long, component long"
    )
    gold = spark.createDataFrame(
        [(i, gc) for i, (_, gc) in assign.items()], "id long, gold_cluster long"
    )
    return clustering_eval(pred, gold).collect()[0], pred, gold


def test_identical_clusterings_all_ones(spark):
    assign = {i: (i % 3, i % 3) for i in range(12)}
    row, _, _ = _run(spark, assign)
    assert row.n_items == 12
    assert row.n_pred_clusters == row.n_gold_clusters == 3
    for m in ("bcubed_precision", "bcubed_recall", "bcubed_f1",
              "rand_index", "adjusted_rand", "homogeneity",
              "completeness", "v_measure"):
        assert row[m] == pytest.approx(1.0), m


def test_singletons_vs_one_cluster(spark):
    # all-singleton prediction vs single gold cluster: B³P = 1 (each
    # predicted cluster pure), B³R = 1/N, ARI = 0 (chance agreement)
    n = 8
    assign = {i: (i, 0) for i in range(n)}
    row, _, _ = _run(spark, assign)
    assert row.bcubed_precision == pytest.approx(1.0)
    assert row.bcubed_recall == pytest.approx(1 / n)
    assert row.rand_index == pytest.approx(0.0)  # no pair agrees
    assert row.adjusted_rand == pytest.approx(0.0)
    # singleton predictions are perfectly pure but fragment the gold
    # cluster completely: homogeneity 1, completeness 0, V 0
    assert row.homogeneity == pytest.approx(1.0)
    assert row.completeness == pytest.approx(0.0)
    assert row.v_measure == pytest.approx(0.0)


def test_matches_pure_python_reference_on_random_clusterings(spark):
    rng = random.Random(41)
    for trial in range(3):
        assign = {
            i: (rng.randrange(5), rng.randrange(4)) for i in range(60)
        }
        row, _, _ = _run(spark, assign)
        P, R, f1 = _py_bcubed(assign)
        ri, ari = _py_rand(assign)
        assert row.bcubed_precision == pytest.approx(P, abs=1e-8)
        assert row.bcubed_recall == pytest.approx(R, abs=1e-8)
        assert row.bcubed_f1 == pytest.approx(f1, abs=1e-8)
        assert row.rand_index == pytest.approx(ri, abs=1e-8)
        assert row.adjusted_rand == pytest.approx(ari, abs=1e-8)
        h, c, v = _py_vmeasure(assign)
        assert row.homogeneity == pytest.approx(h, abs=1e-8)
        assert row.completeness == pytest.approx(c, abs=1e-8)
        assert row.v_measure == pytest.approx(v, abs=1e-8)


def test_degenerate_single_item(spark):
    # n=1: no pairs — RI/ARI NULL (guarded, not an ANSI division error)
    row, _, _ = _run(spark, {0: (0, 0)})
    assert row.n_items == 1
    assert row.bcubed_precision == pytest.approx(1.0)
    assert row.rand_index is None
    assert row.adjusted_rand is None


def test_group_linkage_identity_and_overlap(spark):
    # left {0,1,2}{3,4}; right {0,1}{2,3,4}
    left = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(5)], "id long, component long"
    )
    right = spark.createDataFrame(
        [(i, 10 if i < 2 else 11) for i in range(5)], "id long, component long"
    )
    rows = {
        (r.l_cluster, r.r_cluster): r
        for r in group_linkage(left, right).collect()
    }
    assert set(rows) == {(0, 10), (0, 11), (1, 11)}
    r = rows[(0, 10)]
    assert (r.l_size, r.r_size, r.n_common) == (3, 2, 2)
    assert r.jaccard == pytest.approx(2 / 3)
    assert rows[(0, 11)].jaccard == pytest.approx(1 / 5)
    assert rows[(1, 11)].jaccard == pytest.approx(2 / 3)
    # identity: every cluster maps to itself with jaccard 1
    same = group_linkage(left, left).collect()
    assert all(r.jaccard == pytest.approx(1.0) for r in same)
    assert len(same) == 2
    # min_jaccard filters the weak alignment
    filt = group_linkage(left, right, min_jaccard=0.5).collect()
    assert {(r.l_cluster, r.r_cluster) for r in filt} == {(0, 10), (1, 11)}


def test_blocking_key_report_hand_computed(spark):
    from deepblocker_spark.operators.metrics import blocking_key_report

    # blocks by k1: {a: 1,2,3}, {b: 4,5}, null excluded -> pairs 3+1=4
    rows = [
        (1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
        (4, "b", "y"), (5, "b", "y"), (6, None, "y"),
    ]
    df = spark.createDataFrame(rows, "id long, k1 string, k2 string")
    golden = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5), (1, 6)], "ltable_id long, rtable_id long"
    )
    rep = {
        r.key_set: r
        for r in blocking_key_report(
            df, [["k1"], ["k1", "k2"]], golden, id_col="id"
        ).collect()
    }
    r1 = rep["k1"]
    assert (r1.n_blocks, r1.n_candidate_pairs) == (2, 4)
    # golden hits under k1: (1,2) same, (4,5) same; (3,4) differ; (1,6) null
    assert (r1.tp, r1.n_golden) == (2, 4)
    assert r1.recall == pytest.approx(0.5)
    assert r1.cssr == pytest.approx(4 / 15)
    r2 = rep["k1+k2"]
    # blocks: {a,x: 1,2}, {a,y: 3}, {b,y: 4,5} -> 1+0+1 = 2 pairs
    assert (r2.n_blocks, r2.n_candidate_pairs) == (3, 2)
    assert (r2.tp, r2.n_golden) == (2, 4)

"""One-to-one matching — hand-computed mutual-best cases, plus the
distributed greedy matching checked edge-for-edge against an independent
sequential greedy scan (the textbook algorithm) on random graphs,
including all-equal-score tie storms and both physical paths."""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepblocker_spark.operators.matching import (
    greedy_one_to_one,
    mutual_best_pairs,
)


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "a long, b long, score double")


def _sequential_greedy(rows):
    """Independent oracle: scan by (score desc, a asc, b asc), take an
    edge iff both endpoints are free."""
    taken, out = set(), set()
    for a, b, s in sorted(rows, key=lambda r: (-r[2], r[0], r[1])):
        if a not in taken and b not in taken:
            taken.add(a)
            taken.add(b)
            out.add((a, b, s))
    return out


def test_mutual_best_simple_chain(spark):
    # 1-2 (0.9), 2-3 (0.8), 3-4 (0.95): 3-4 mutual; 1-2 mutual (2's best
    # is 1? no — 2's edges: 1@0.9, 3@0.8 -> best 1; 1's best is 2) ✓;
    # 2-3 not mutual (neither endpoint ranks it first).
    rows = [(1, 2, 0.9), (2, 3, 0.8), (3, 4, 0.95)]
    got = {tuple(r) for r in mutual_best_pairs(_edges_df(spark, rows)).collect()}
    assert got == {(1, 2, 0.9), (3, 4, 0.95)}


def test_mutual_best_tie_broken_by_edge_key(spark):
    # node 2 ties between 1 and 3 at 0.5 -> global order picks (1,2)
    # before (2,3); (1,2) is mutual, (2,3) is not.
    rows = [(1, 2, 0.5), (2, 3, 0.5)]
    got = {tuple(r) for r in mutual_best_pairs(_edges_df(spark, rows)).collect()}
    assert got == {(1, 2, 0.5)}


def test_mutual_best_empty(spark):
    assert mutual_best_pairs(_edges_df(spark, [])).count() == 0


def _random_rows(seed, n_nodes=60, n_edges=150, tie_storm=False):
    rng = np.random.default_rng(seed)
    seen = set()
    while len(seen) < n_edges:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            seen.add((min(int(a), int(b)), max(int(a), int(b))))
    if tie_storm:
        return [(a, b, 1.0) for a, b in sorted(seen)]
    return [
        (a, b, float(np.round(rng.random(), 6))) for a, b in sorted(seen)
    ]


def test_greedy_equals_sequential_oracle_driver_path(spark):
    rows = _random_rows(7)
    got = greedy_one_to_one(_edges_df(spark, rows))  # small -> driver path
    assert {tuple(r) for r in got.collect()} == _sequential_greedy(rows)


def test_greedy_hint_skips_count_job(spark, monkeypatch):
    """VERDICT r4 #7: with n_edges_hint the path-picking count job never
    runs — proven by making DataFrame.count raise. Both hint directions
    must still produce the sequential-oracle matching."""
    from pyspark.sql import DataFrame

    rows = _random_rows(9)
    want = _sequential_greedy(rows)

    def _boom(self):
        raise AssertionError("count() must not run when n_edges_hint is set")

    monkeypatch.setattr(DataFrame, "count", _boom)
    small = greedy_one_to_one(_edges_df(spark, rows), n_edges_hint=len(rows))
    assert {tuple(r) for r in small.collect()} == want
    big = greedy_one_to_one(
        _edges_df(spark, rows), n_edges_hint=len(rows), driver_threshold=0
    )
    assert {tuple(r) for r in big.collect()} == want


def test_greedy_equals_sequential_oracle_distributed_path(spark):
    rows = _random_rows(11)
    got = greedy_one_to_one(_edges_df(spark, rows), driver_threshold=0)
    assert {tuple(r) for r in got.collect()} == _sequential_greedy(rows)


def test_greedy_tie_storm_paths_agree(spark):
    # every score equal: the global (a, b) tie order alone must make both
    # physical paths reproduce the sequential scan exactly
    rows = _random_rows(3, tie_storm=True)
    want = _sequential_greedy(rows)
    for thr in (0, 10**6):
        got = greedy_one_to_one(_edges_df(spark, rows), driver_threshold=thr)
        assert {tuple(r) for r in got.collect()} == want


def test_greedy_matching_is_node_disjoint_and_maximal(spark):
    rows = _random_rows(23, n_nodes=40, n_edges=120)
    matched = greedy_one_to_one(_edges_df(spark, rows), driver_threshold=0).collect()
    used = [x for r in matched for x in (r["a"], r["b"])]
    assert len(used) == len(set(used))  # one-to-one
    free = set(range(40)) - set(used)
    # maximal: no input edge joins two free nodes
    assert not any(a in free and b in free for a, b, _ in rows)


def test_greedy_empty_and_self_loop(spark):
    assert greedy_one_to_one(_edges_df(spark, [])).count() == 0
    only_loop = _edges_df(spark, [(5, 5, 1.0)])
    assert greedy_one_to_one(only_loop).count() == 0


def test_mutual_best_pandas_crosscheck(spark):
    # independent pandas recomputation of round-1 mutual best
    rows = _random_rows(41)
    pdf = pd.DataFrame(rows, columns=["a", "b", "score"])
    directed = pd.concat(
        [
            pdf.assign(node=pdf["a"]),
            pdf.assign(node=pdf["b"]),
        ]
    ).sort_values(["score", "a", "b"], ascending=[False, True, True])
    best = directed.groupby("node", sort=False).head(1)
    counts = best.groupby(["a", "b", "score"]).size()
    want = {k for k, v in counts.items() if v == 2}
    got = {tuple(r) for r in mutual_best_pairs(_edges_df(spark, rows)).collect()}
    assert got == want


def test_monge_elkan_matches_pure_python(spark):
    from deepblocker_spark.operators.scoring import (
        jaro_winkler,
        monge_elkan_scores,
    )

    rows = [
        (1, ["john", "r", "smith"], ["smith", "john"]),
        (2, ["acme", "corp"], ["acme", "corporation", "ltd"]),
        (3, [], ["anything"]),          # empty left -> 0.0
        (4, ["solo"], []),              # empty right -> 0.0
        (5, ["dup", "dup", "x"], ["dup"]),  # duplicate occurrences count
    ]
    df = spark.createDataFrame(
        rows, "pid long, lt array<string>, rt array<string>"
    )
    got = {r.pid: r.me_jw for r in
           monge_elkan_scores(df, "lt", "rt").collect()}

    def me(L, R):
        if not L or not R:
            return 0.0
        return sum(
            max(jaro_winkler(t, u, boost_threshold=0.7) for u in R) for t in L
        ) / len(L)

    import pytest as _pt
    for pid, L, R in rows:
        assert got[pid] == _pt.approx(me(L, R), abs=1e-12), pid
    # symmetric = mean of both directions
    sym = {r.pid: r.me_jw for r in
           monge_elkan_scores(df, "lt", "rt", symmetric=True).collect()}
    for pid, L, R in rows:
        assert sym[pid] == _pt.approx((me(L, R) + me(R, L)) / 2, abs=1e-12)


def test_soft_tfidf_matches_pure_python(spark):
    from deepblocker_spark.operators.scoring import (
        jaro_winkler,
        soft_tfidf_scores,
        tfidf_vectors,
    )

    docs = spark.createDataFrame(
        [
            (1, "acme corp global"),
            (2, "acme corporation global"),
            (3, "zenith media"),
            (4, "acme corp globel"),   # typo'd token -> soft match
        ],
        "id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 4)], "a long, b long"
    )
    w = tfidf_vectors(docs, id_col="id", text_col="text")
    got = {(r.a, r.b): r.soft_tfidf for r in
           soft_tfidf_scores(pairs, w, theta=0.85).collect()}

    wmap: dict = {}
    for r in w.collect():
        wmap.setdefault(r.id, {})[r.token] = r.wn

    def stf(a, b):
        s = 0.0
        for t, wt in wmap[a].items():
            best, bu = -1.0, None
            for u in sorted(wmap[b]):
                j = jaro_winkler(t, u, boost_threshold=0.7)
                if j > best:
                    best, bu = j, u
            if best >= 0.85:
                s += wt * wmap[b][bu] * best
        return s

    import pytest as _pt
    for (a, b), v in got.items():
        assert v == _pt.approx(stf(a, b), abs=1e-12), (a, b)
    # sanity: exact-shared tokens score high, disjoint docs score 0
    assert got[(1, 2)] > 0.5
    assert got[(1, 3)] == 0.0
    assert got[(1, 4)] > got[(1, 3)]


def test_monge_elkan_and_soft_tfidf_randomized_parity(spark):
    """Seeded randomized sweep: random token multisets (shared vocab with
    typos, duplicates, empties) — engine scores must match the literal
    pure-python definitions exactly."""
    import random

    from deepblocker_spark.operators.scoring import (
        jaro_winkler,
        monge_elkan_scores,
        soft_tfidf_scores,
        tfidf_vectors,
    )

    rng = random.Random(23)
    vocab = ["acme", "corp", "global", "media", "zenith", "north",
             "labs", "inc", "acm", "corpp", "globel", "medai"]

    def rand_text():
        k = rng.randrange(0, 6)
        return " ".join(rng.choice(vocab) for _ in range(k))

    docs = [(i, rand_text()) for i in range(30)]
    ddf = spark.createDataFrame(docs, "id long, text string")
    pair_rows = [(rng.randrange(30), rng.randrange(30)) for _ in range(40)]
    pair_rows = [(a, b) for a, b in dict.fromkeys(pair_rows)]
    pdf = spark.createDataFrame(pair_rows, "a long, b long")

    toks = {i: t.split() if t else [] for i, t in docs}

    # Monge-Elkan
    tdf = ddf.selectExpr("id", "split(text, ' ') as tk") \
        .selectExpr("id", "filter(tk, t -> t <> '') as tk")
    joined = (
        pdf.join(tdf.selectExpr("id as a", "tk as lt"), "a")
        .join(tdf.selectExpr("id as b", "tk as rt"), "b")
    )
    got_me = {(r.a, r.b): r.me_jw for r in
              monge_elkan_scores(joined, "lt", "rt").collect()}

    def me(L, R):
        if not L or not R:
            return 0.0
        return sum(max(jaro_winkler(t, u, boost_threshold=0.7) for u in R)
                   for t in L) / len(L)

    import pytest as _pt
    for a, b in pair_rows:
        assert got_me[(a, b)] == _pt.approx(me(toks[a], toks[b]), abs=1e-12)

    # soft TF-IDF
    w = tfidf_vectors(ddf, id_col="id", text_col="text")
    wmap: dict = {}
    for r in w.collect():
        wmap.setdefault(r.id, {})[r.token] = r.wn
    got_st = {(r.a, r.b): r.soft_tfidf for r in
              soft_tfidf_scores(pdf, w, theta=0.88).collect()}

    def stf(a, b):
        s = 0.0
        for t, wt in wmap.get(a, {}).items():
            best, bu = -1.0, None
            for u in sorted(wmap.get(b, {})):
                j = jaro_winkler(t, u, boost_threshold=0.7)
                if j > best:
                    best, bu = j, u
            if bu is not None and best >= 0.88:
                s += wt * wmap[b][bu] * best
        return s

    for a, b in pair_rows:
        assert got_st[(a, b)] == _pt.approx(stf(a, b), abs=1e-12), (a, b)

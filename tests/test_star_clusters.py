"""Star clustering (operators/cluster.star_clusters) — hand-computed
chain example (the over-merge case CC gets wrong), a randomized parity
check against an independent pandas implementation of the same spec, and
the structural invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepblocker_spark.operators.cluster import connected_components, star_clusters

SCALE = 1_000_000


def _pandas_star(edges: list[tuple[int, int, float]]) -> dict[int, int]:
    """Independent reimplementation of the one-pass spec."""
    sym: dict[tuple[int, int], int] = {}
    for a, b, s in edges:
        si = round(round(s, 6) * SCALE)
        for u, v in ((a, b), (b, a)):
            k = (u, v)
            sym[k] = max(sym.get(k, -(10**18)), si)
    deg: dict[int, int] = {}
    for (u, _v), s in sym.items():
        deg[u] = deg.get(u, 0) + s
    nodes = sorted(deg)
    nbrs: dict[int, list[tuple[int, int]]] = {u: [] for u in nodes}
    for (u, v), s in sym.items():
        nbrs[u].append((v, s))
    centers = set()
    for u in nodes:
        if not any(
            (deg[v] > deg[u]) or (deg[v] == deg[u] and v < u)
            for v, _ in nbrs[u]
        ):
            centers.add(u)
    out = {}
    for u in nodes:
        if u in centers:
            out[u] = u
            continue
        cand = [(s, v) for v, s in nbrs[u] if v in centers]
        if cand:
            out[u] = max(cand, key=lambda t: (t[0], -t[1]))[1]
        else:
            out[u] = u
    return out


def test_star_breaks_chain_cc_merges(spark):
    edges = [(1, 2, 0.9), (2, 3, 0.8), (3, 4, 0.9), (4, 5, 0.7)]
    df = spark.createDataFrame(edges, ["a", "b", "sim"])
    got = dict(
        star_clusters(df).toPandas()[["id", "center"]].itertuples(index=False)
    )
    # deg: 2 and 3 tie at 1.7M -> id asc makes 2 the center; 4 and 5 are
    # dominated only by non-centers -> singletons (the one-pass rule)
    assert got == {1: 2, 2: 2, 3: 2, 4: 4, 5: 5}
    # CC merges the whole chain into one component — the over-merge star
    # clustering exists to prevent
    cc = connected_components(df, src="a", dst="b").toPandas()
    assert cc["component"].nunique() == 1


def test_star_matches_pandas_oracle_randomized(spark):
    rng = np.random.default_rng(29)
    n = 120
    rows = []
    seen = set()
    for _ in range(400):
        a, b = map(int, rng.integers(0, n, 2))
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        rows.append((a, b, float(np.round(rng.random(), 6))))
    df = spark.createDataFrame(rows, ["a", "b", "sim"]).repartition(7)
    got = dict(
        star_clusters(df).toPandas()[["id", "center"]].itertuples(index=False)
    )
    assert got == _pandas_star(rows)


def test_star_invariants(spark):
    rng = np.random.default_rng(31)
    rows = [
        (int(a), int(b), float(np.round(rng.random(), 6)))
        for a, b in rng.integers(0, 60, (200, 2))
        if a != b
    ]
    df = spark.createDataFrame(rows, ["a", "b", "sim"])
    out = star_clusters(df).toPandas()
    nodes = {x for a, b, _ in rows for x in (a, b)}
    # every node exactly once
    assert sorted(out["id"]) == sorted(nodes)
    # every center maps to itself
    centers = set(out[out["id"] == out["center"]]["id"])
    assert set(out["center"]) <= centers | set(out["id"])
    # an attached node's center is one of its neighbors
    nbrs = {u: set() for u in nodes}
    for a, b, _ in rows:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for i, c in out[["id", "center"]].itertuples(index=False):
        if i != c:
            assert c in nbrs[i]
            assert c in centers

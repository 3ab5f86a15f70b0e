"""PassJoin edit-distance threshold join — losslessness is the whole
point: its output must EQUAL a brute-force Levenshtein recomputation
across thresholds, string shapes, and the degenerate cases the pigeonhole
windows have to survive (empty strings, strings shorter than d+1, ties,
duplicate texts)."""

from __future__ import annotations

import itertools

import numpy as np

from deepblocker_spark.operators.dedup import (
    edit_distance_pairs,
    edit_distance_pairs_dyadic,
)


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    if m == 0:
        return n
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _brute_force(rows, d):
    return {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= d
    }


def _run(spark, rows, d):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = edit_distance_pairs(df, max_dist=d).collect()
    pairs = {(r.a, r.b, r.dist) for r in got}
    assert len(pairs) == len(got), "duplicate pairs emitted"
    assert all(r.a < r.b for r in got)
    return pairs


def _mutated_corpus(seed, n_base=40, muts_per_base=3):
    """Deterministic near-duplicate corpus: random word strings plus 1-3
    character-level edits (substitute / insert / delete) of each."""
    rng = np.random.default_rng(seed)
    alpha = list("abcdefgh ")
    base = [
        "".join(rng.choice(alpha, size=rng.integers(5, 25)))
        for _ in range(n_base)
    ]
    texts = list(base)
    for s in base:
        for _ in range(muts_per_base):
            t = list(s)
            for _ in range(rng.integers(1, 4)):
                op = rng.integers(0, 3)
                pos = int(rng.integers(0, max(len(t), 1)))
                if op == 0 and t:
                    t[min(pos, len(t) - 1)] = str(rng.choice(alpha))
                elif op == 1:
                    t.insert(pos, str(rng.choice(alpha)))
                elif t:
                    del t[min(pos, len(t) - 1)]
            texts.append("".join(t))
    return [(i, s) for i, s in enumerate(texts)]


def test_edit_join_matches_brute_force_across_thresholds(spark):
    rows = _mutated_corpus(seed=7)
    for d in (0, 1, 2, 3):
        assert _run(spark, rows, d) == _brute_force(rows, d), f"d={d}"


def test_edit_join_degenerate_shapes(spark):
    # strings shorter than d+1 (zero-length segments), empties, exact
    # duplicates under distinct ids, and a long-run tie storm
    rows = list(
        enumerate(
            ["", "", "a", "b", "ab", "ba", "abc", "abcd", "q" * 30,
             "q" * 29, "q" * 29 + "z", "z" + "q" * 29, "kitten", "sitting"]
        )
    )
    for d in (1, 2):
        assert _run(spark, rows, d) == _brute_force(rows, d), f"d={d}"


def test_edit_join_no_candidates(spark):
    rows = [(0, "aaaaaaaaaa"), (1, "bbbbbbbbbb"), (2, "cccccccccc")]
    assert _run(spark, rows, 2) == set()


def test_edit_join_dyadic_matches_brute_force(spark):
    rows = _mutated_corpus(seed=11, n_base=30)
    half = len(rows) // 2
    lrows, rrows = rows[:half], rows[half:]
    ldf = spark.createDataFrame(lrows, "doc_id long, text string")
    rdf = spark.createDataFrame(rrows, "doc_id long, text string")
    for d in (1, 2):
        got = edit_distance_pairs_dyadic(ldf, rdf, max_dist=d).collect()
        pairs = {(r.l_id, r.r_id, r.dist) for r in got}
        assert len(pairs) == len(got), "duplicate pairs emitted"
        want = {
            (i, j, _lev(a, b))
            for i, a in lrows
            for j, b in rrows
            if _lev(a, b) <= d
        }
        assert pairs == want, f"d={d}"


def test_edit_join_dyadic_length_skew_both_directions(spark):
    # left longer than right AND right longer than left, plus degenerate
    # empty/short strings on either side — the full [m-d, m+d] window
    ldf = spark.createDataFrame(
        [(0, "abcd"), (1, "ab"), (2, ""), (3, "q" * 20)],
        "doc_id long, text string",
    )
    rrows = [(10, "ab"), (11, "abcdef"), (12, "x"), (13, "q" * 22)]
    rdf = spark.createDataFrame(rrows, "doc_id long, text string")
    got = {
        (r.l_id, r.r_id, r.dist)
        for r in edit_distance_pairs_dyadic(ldf, rdf, max_dist=2).collect()
    }
    lrows = [(0, "abcd"), (1, "ab"), (2, ""), (3, "q" * 20)]
    want = {
        (i, j, _lev(a, b))
        for i, a in lrows
        for j, b in rrows
        if _lev(a, b) <= 2
    }
    assert got == want


def test_edit_join_exhaustive_small_alphabet(spark):
    # every string over {a, b} of length <= 4 (31 strings), self-joined at
    # d = 1..3: exhausts every boundary of the shift-bounded probe window
    # (all length deltas, all segment alignments) against brute force
    rows = []
    strs = [""]
    for _ in range(4):
        strs = [s + c for s in strs for c in "ab"]
        rows.extend(strs)
    rows = [(i, s) for i, s in enumerate([""] + rows)]
    for d in (1, 2, 3):
        assert _run(spark, rows, d) == _brute_force(rows, d), f"d={d}"


def test_edit_join_unicode_parity(spark):
    # Spark's length/substring/levenshtein are codepoint-based and must
    # agree with Python's — including multibyte and astral-plane chars
    # (UTF-16 surrogate pairs are where a UTF8String implementation would
    # diverge if it counted code units).
    rows = list(
        enumerate(
            ["café", "cafe", "caffé", "straße", "strasse", "中文字符",
             "中文字号", "中文", "naïve", "naive", "𝄞clef", "Xclef",
             "🎼🎼a", "🎼🎼b"]
        )
    )
    for d in (1, 2):
        assert _run(spark, rows, d) == _brute_force(rows, d), f"d={d}"


def test_edit_join_hypothesis_random_strings(spark):
    # randomized parity over a mixed ascii/multibyte alphabet — one batched
    # Spark round-trip over many generated corpora (per-example Spark jobs
    # would be minutes; the generation is hypothesis-style but seeded/
    # deterministic for CI stability)
    rng = np.random.default_rng(1234)
    alpha = list("abcß中🎼")
    corpora = []
    for _ in range(6):
        strs = [
            "".join(rng.choice(alpha, size=rng.integers(0, 9)))
            for _ in range(30)
        ]
        corpora.append([(i, s) for i, s in enumerate(strs)])
    for ci, rows in enumerate(corpora):
        d = int(rng.integers(1, 4))
        assert _run(spark, rows, d) == _brute_force(rows, d), f"corpus={ci} d={d}"


def test_edit_join_rejects_negative_threshold(spark):
    import pytest

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, max_dist=-1)

"""Suffix-array blocking — pairs, longest-shared-suffix selection, the
max-block purge, and the purge audit must all match a brute-force pandas
recomputation."""

from __future__ import annotations

import itertools
from collections import Counter

from deepblocker_spark.operators.dedup import (
    purged_suffix_blocks,
    suffix_blocking_pairs,
)

NAMES = [
    "christen", "kristen", "kristin", "christine",
    "main street", "wall street", "mill street",
    "abc", "xyz",            # below min_suffix_len -> no postings
    "street", "treet",       # exactly-at and near the boundary
    "christen",              # exact duplicate under a distinct id
]


def _suffixes(k, min_len):
    return {k[len(k) - n:] for n in range(min_len, len(k) + 1)}


def _brute(rows, min_len, cap):
    sufs = {i: _suffixes(k, min_len) for i, k in rows}
    if cap is not None:
        counts = Counter(s for ss in sufs.values() for s in ss)
        sufs = {i: {s for s in ss if counts[s] <= cap} for i, ss in sufs.items()}
    out = {}
    for (i, _), (j, _) in itertools.combinations(rows, 2):
        shared = sufs[i] & sufs[j]
        if shared:
            best = max(shared, key=len)
            out[(i, j)] = (best, len(best))
    return out


def _rows():
    return [(i, k) for i, k in enumerate(NAMES)]


def _run(spark, rows, min_len, cap):
    df = spark.createDataFrame(rows, "doc_id long, name string")
    got = suffix_blocking_pairs(
        df, "name", id_col="doc_id", min_suffix_len=min_len,
        max_block_rows=cap,
    ).collect()
    assert all(r.a < r.b for r in got)
    assert len({(r.a, r.b) for r in got}) == len(got)
    return {(r.a, r.b): (r.suffix, r.suffix_len) for r in got}


def test_suffix_blocking_matches_brute_force(spark):
    rows = _rows()
    for min_len, cap in [(4, None), (4, 3), (3, None), (6, None), (4, 1)]:
        assert _run(spark, rows, min_len, cap) == _brute(rows, min_len, cap), (
            min_len, cap,
        )


def test_suffix_blocking_purge_audit_matches_drop(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, name string")
    cap = 3
    audited = {
        (r.suffix, r.block_size)
        for r in purged_suffix_blocks(
            df, "name", min_suffix_len=4, max_block_rows=cap
        ).collect()
    }
    counts = Counter(
        s for _, k in rows for s in _suffixes(k, 4)
    )
    expected = {(s, c) for s, c in counts.items() if c > cap}
    assert audited == expected
    # and every audited suffix is absent from the capped pair run's blocks
    capped = _run(spark, rows, 4, cap)
    for (a, b), (suffix, _) in capped.items():
        assert counts[suffix] <= cap

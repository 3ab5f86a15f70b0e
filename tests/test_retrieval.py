"""BM25 top-k retrieval vs a pure-Python brute force (same tokenizer)."""

from __future__ import annotations

import math

import pytest

from deepblocker_spark.functions.tokenizer import basic_english_tokenize
from deepblocker_spark.operators.retrieval import bm25_postings, bm25_topk

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog outpaces a quick fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "the dog sleeps"),
    (5, "fox fox fox fox fox"),
    (6, ""),
]

QUERIES = [
    (10, "quick fox"),
    (11, "lazy dog"),
    (12, "zzz-novocab"),
    (13, "dolor dolor dolor"),  # repeated query term scores once
]


def brute_bm25(k1=1.2, b=0.75, max_df_ratio=1.0):
    toks = {i: basic_english_tokenize(t) for i, t in CORPUS}
    n = len(CORPUS)
    dl = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in QUERIES:
        scores = {}
        for t in set(basic_english_tokenize(qtext)):
            if t not in df or df[t] > max_df_ratio * n:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for i, ts in toks.items():
                tf = ts.count(t)
                if not tf:
                    continue
                part = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl[i] / avgdl)
                )
                scores[i] = scores.get(i, 0.0) + part
        out[qid] = sorted(
            ((round(s, 9), i) for i, s in scores.items()),
            key=lambda p: (-p[0], p[1]),
        )
    return out


@pytest.fixture()
def frames(spark):
    c = spark.createDataFrame(CORPUS, "id long, text string")
    q = spark.createDataFrame(QUERIES, "qid long, qtext string")
    return q, c


def test_bm25_topk_matches_brute_force(spark, frames):
    q, c = frames
    got = {
        (r.qid, r.rank): (r.id, r.bm25)
        for r in bm25_topk(q, c, k=3).collect()
    }
    want = brute_bm25()
    for qid, ranked in want.items():
        for rank, (s9, i) in enumerate(ranked[:3], start=1):
            gi, gs = got.pop((qid, rank))
            assert gi == i, (qid, rank)
            assert gs == pytest.approx(round(s9, 6), abs=2e-6)
    assert not got  # nothing beyond the brute-force expectation
    # no-vocab query returns no rows at all (checked via pop above)


def test_bm25_rank_dense_from_one_and_self_retrieval(spark, frames):
    q, c = frames
    out = bm25_topk(q, c, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # query 13 ("dolor" x3) hits exactly doc 3, once, despite repetition
    hits13 = [r for r in out if r.qid == 13]
    assert [(r.id, r.rank) for r in hits13] == [(3, 1)]


def test_bm25_stopword_purge(spark, frames):
    q, c = frames
    # "the" and "quick"/"fox"/"dog" have df>=2; ratio 0.2 keeps only df<=1.2
    want = brute_bm25(max_df_ratio=0.2)
    got = {}
    for r in bm25_topk(q, c, k=3, max_df_ratio=0.2).collect():
        got.setdefault(r.qid, []).append((r.rank, r.id))
    for qid, ranked in want.items():
        exp = [(rk, i) for rk, (_, i) in enumerate(ranked[:3], start=1)]
        assert sorted(got.get(qid, [])) == exp, qid


def test_bm25_postings_idf_nonnegative(spark, frames):
    _, c = frames
    rows = bm25_postings(c).collect()
    assert rows and all(r.part >= 0 for r in rows)


def test_bm25_k_validation(spark, frames):
    q, c = frames
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(q, c, k=0)


def test_bm25_partition_by_equals_per_slice_runs(spark):
    # filtered retrieval parity: partition_by must be bit-identical to
    # running the un-partitioned operator independently per slice (same
    # per-partition N/avgdl/df statistics, no cross-partition hits)
    corpus = spark.createDataFrame(
        [(i, t, lang) for (i, t), lang in zip(CORPUS, ["en", "en", "fr", "en", "fr", "fr"])],
        "id long, text string, lang string",
    )
    qs = spark.createDataFrame(
        [(10, "quick fox", "en"), (11, "quick fox", "fr"),
         (13, "dolor sit", "fr"), (14, "dolor sit", "en")],
        "qid long, qtext string, lang string",
    )
    got = sorted(
        (r.qid, r.rank, r.id, r.bm25)
        for r in bm25_topk(qs, corpus, k=3, partition_by="lang").collect()
    )
    want = []
    for lang in ("en", "fr"):
        sliced = bm25_topk(
            qs.filter(f"lang = '{lang}'"), corpus.filter(f"lang = '{lang}'"), k=3
        )
        want += [(r.qid, r.rank, r.id, r.bm25) for r in sliced.collect()]
    assert got == sorted(want)
    # cross-partition leakage check: fr query 13 must hit fr doc 3 only,
    # en query 14 must hit nothing (no "dolor" in the en slice)
    by_q = {}
    for qid, rank, i, _ in got:
        by_q.setdefault(qid, []).append(i)
    assert by_q.get(13) == [3]
    assert 14 not in by_q

"""Dedup-suite and text-analysis operator tests with hand-computed oracles."""

from __future__ import annotations

import pytest

from deepblocker_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from deepblocker_spark.operators.textstats import document_profile


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near the river bank"),
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
            (2, "the quick brown fox jumps over the lazy dog near the bank"),  # near dup of 0
            (3, "completely different content about database query engines and optimizers"),
            (4, "el rapido zorro marron salta sobre el perro perezoso de la ciudad"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )


def test_exact_duplicates(spark):
    out = exact_duplicates(_docs(spark)).toPandas()
    assert set(out["doc_id"]) == {0, 1}
    assert (out["group_size"] == 2).all()


def test_minhash_signature_properties(spark):
    sig = minhash_signatures(_docs(spark), num_hashes=8).toPandas().set_index("doc_id")
    # identical docs -> identical signatures
    assert list(sig.loc[0]) == list(sig.loc[1])
    # near-dup shares most minhashes; unrelated shares few
    same_near = sum(sig.loc[0, f"mh{i}"] == sig.loc[2, f"mh{i}"] for i in range(8))
    same_far = sum(sig.loc[0, f"mh{i}"] == sig.loc[3, f"mh{i}"] for i in range(8))
    assert same_near >= 5
    assert same_far <= 2


def test_minhash_lsh_finds_near_dups(spark):
    pairs = minhash_lsh_pairs(
        _docs(spark), num_hashes=16, n_bands=8, jaccard_threshold=0.5
    ).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in found
    assert (0, 2) in found and (1, 2) in found
    assert not any(3 in p or 4 in p for p in found)
    # jaccard of exact dup is 1.0
    exact_row = pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]
    assert exact_row["jaccard"].iloc[0] == pytest.approx(1.0)


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.3).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in found
    assert (0, 2) in found
    assert not any(3 in p for p in found)
    row = pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]
    assert row["jaccard"].iloc[0] == pytest.approx(1.0)


def test_simhash_properties(spark):
    sh = simhash(_docs(spark)).toPandas().set_index("doc_id")["simhash"]
    assert sh.loc[0] == sh.loc[1]
    ham = bin(int(sh.loc[0]) ^ int(sh.loc[2])).count("1")
    ham_far = bin(int(sh.loc[0]) ^ int(sh.loc[3])).count("1")
    assert ham < ham_far
    assert sh.loc[5] == 0


def test_simhash_near_duplicates(spark):
    out = simhash_near_duplicates(_docs(spark), max_hamming=10).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(out["a"], out["b"])}
    assert (0, 1) in found
    ham0 = out[(out["a"] == 0) & (out["b"] == 1)]["hamming"].iloc[0]
    assert ham0 == 0


def test_document_profile(spark):
    prof = document_profile(_docs(spark)).toPandas().set_index("doc_id")
    assert prof.loc[0, "n_tokens"] == 13
    assert prof.loc[0, "lang_pred"] == "en"
    assert prof.loc[4, "lang_pred"] == "es"
    assert prof.loc[5, "n_tokens"] == 0
    assert prof.loc[5, "lang_pred"] == "und"
    # layout-invariant fingerprint: extra whitespace doesn't change it
    df2 = spark.createDataFrame(
        [(0, "the  quick   brown fox jumps over the lazy dog near the river bank")],
        ["doc_id", "text"],
    )
    fp2 = document_profile(df2).collect()[0]["fingerprint"]
    assert fp2 == prof.loc[0, "fingerprint"]
    assert 0.0 <= prof["quality"].min() and prof["quality"].max() <= 1.0
    assert prof.loc[0, "stopword_ratio"] == pytest.approx(3 / 13, abs=1e-5)


def test_ngram_stop_shingles_bound_join_keep_true_pairs(spark):
    """VERDICT r1 #8: a boilerplate shingle shared by ALL docs must be
    droppable via max_shingle_df without losing the true near-dup pairs
    (their jaccard over non-boilerplate shingles stays above threshold)."""
    import pandas as pd
    from deepblocker_spark.operators.dedup import hot_shingles

    boiler = "licensed under the apache license version two"
    docs = []
    for i in range(30):
        docs.append((i, f"{boiler} unique document {i} body text payload {i} marker end"))
    # one true near-dup pair: 100 and 101 share almost all content
    docs.append((100, f"{boiler} shared corpus alpha beta gamma delta epsilon zeta"))
    docs.append((101, f"{boiler} shared corpus alpha beta gamma delta epsilon eta"))
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))

    hot = hot_shingles(df, n=3, max_shingle_df=10).toPandas()
    assert len(hot) > 0  # the boilerplate shingles are detected
    assert (hot["doc_freq"] == 32).any()

    out = ngram_jaccard_pairs(df, n=3, threshold=0.3, max_shingle_df=10).toPandas()
    got = set(zip(out["a"], out["b"]))
    assert (100, 101) in got
    # boilerplate-only co-occurrence must NOT produce pairs
    assert all(a >= 100 for a, b in got), got


def test_key_blocking_pairs_and_purge(spark):
    """Attribute blocking: intra-block pairs only, a<b, block size attached;
    max_block_rows purges oversized blocks entirely (the quadratic guard)."""
    from deepblocker_spark.operators.dedup import key_blocking_pairs

    rows = [
        (1, "en", "s1"), (2, "en", "s1"), (3, "en", "s1"),
        (4, "de", "s1"), (5, "de", "s1"),
        (6, "fr", "s2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    out = key_blocking_pairs(df, ["lang", "source"], id_col="doc_id")
    got = {(r["a"], r["b"]): r["block_size"] for r in out.collect()}
    assert got == {(1, 2): 3, (1, 3): 3, (2, 3): 3, (4, 5): 2}
    purged = key_blocking_pairs(
        df, ["lang", "source"], id_col="doc_id", max_block_rows=2
    )
    got2 = {(r["a"], r["b"]) for r in purged.collect()}
    assert got2 == {(4, 5)}  # the size-3 'en' block is purged, not truncated


def test_purged_blocks_lists_exactly_the_dropped_blocks(spark):
    """VERDICT r3 #4 — the purge is auditable: ``purged_blocks`` returns
    exactly the (key, block_size) groups ``key_blocking_pairs`` excludes
    under the same cap, and covered + purged keys = the full key population
    (no silent drop)."""
    from deepblocker_spark.operators.dedup import key_blocking_pairs, purged_blocks

    rows = [
        (1, "en", "s1"), (2, "en", "s1"), (3, "en", "s1"),
        (4, "de", "s1"), (5, "de", "s1"),
        (6, "fr", "s2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    cap = 2
    purged = purged_blocks(df, ["lang", "source"], max_block_rows=cap).collect()
    assert {(r["lang"], r["source"], r["block_size"]) for r in purged} == {
        ("en", "s1", 3)
    }
    pairs = key_blocking_pairs(
        df, ["lang", "source"], id_col="doc_id", max_block_rows=cap
    ).collect()
    covered = {(r["lang"], r["source"]) for r in pairs}
    # disjoint: no purged block produced pairs
    assert covered.isdisjoint({(r["lang"], r["source"]) for r in purged})
    # complete: covered + purged + singletons (size 1 can't pair) = all keys
    all_keys = {(r["lang"], r["source"]) for r in df.collect()}
    singles = {("fr", "s2")}
    assert covered | {(r["lang"], r["source"]) for r in purged} | singles == all_keys


def test_minhash_dyadic_cross_side_only_and_consistent_with_self(spark):
    from deepblocker_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_dyadic,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + (f" extra{i}" if i % 3 == 0 else "")) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    left = df.filter("doc_id % 2 = 0")
    right = df.filter("doc_id % 2 = 1")
    dy = minhash_lsh_pairs_dyadic(
        left, right, num_hashes=16, n_bands=8, jaccard_threshold=0.8
    ).collect()
    assert dy
    assert all(r.a % 2 == 0 and r.b % 2 == 1 for r in dy)
    # dyadic pairs == the self-join's cross-parity subset (same bands,
    # same threshold): neither side gains nor loses a cross pair
    selfp = minhash_lsh_pairs(
        df, num_hashes=16, n_bands=8, jaccard_threshold=0.8
    ).collect()
    cross_from_self = {
        (r.a, r.b) if r.a % 2 == 0 else (r.b, r.a)
        for r in selfp
        if r.a % 2 != r.b % 2
    }
    assert {(r.a, r.b) for r in dy} == cross_from_self


def test_key_blocking_dyadic_and_purge_audit(spark):
    from deepblocker_spark.operators.dedup import (
        key_blocking_pairs_dyadic,
        purged_blocks_dyadic,
    )

    left = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "z")], "doc_id long, k string"
    )
    right = spark.createDataFrame(
        [(10, "x"), (11, "y"), (12, "y"), (13, "w")], "doc_id long, k string"
    )
    out = key_blocking_pairs_dyadic(left, right, ["k"]).collect()
    got = {(r.a, r.b): r.block_size for r in out}
    # x: 2 left x 1 right (joint 3); y: 1 x 2 (joint 3); z/w unmatched
    assert got == {(1, 10): 3, (2, 10): 3, (3, 11): 3, (3, 12): 3}
    # purge joint blocks > 2: everything goes, and the audit lists exactly
    # the excluded blocks
    capped = key_blocking_pairs_dyadic(left, right, ["k"], max_block_rows=2)
    assert capped.count() == 0
    purged = {(r.k, r.block_size)
              for r in purged_blocks_dyadic(left, right, ["k"], 2).collect()}
    assert purged == {("x", 3), ("y", 3)}


def test_decontamination_pairs_hand_computed(spark):
    from deepblocker_spark.operators.dedup import decontamination_pairs

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # shares "alpha beta gamma"
            (2, "beta gamma delta epsilon"),      # shares "beta gamma delta"
            (3, "zeta eta theta iota"),           # no overlap
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],  # 3 distinct 3-shingles
        ["doc_id", "text"],
    )
    got = {
        (r.train_id, r.eval_id): (r.n_shared, r.containment)
        for r in decontamination_pairs(train, ev, n=3).collect()
    }
    # eval shingles: {a b g, b g d, g d e}; train 1 holds 2 of them,
    # train 2 holds 2 ("b g d", "g d e")
    assert got == {
        (1, 100): (2, pytest.approx(2 / 3)),
        (2, 100): (2, pytest.approx(2 / 3)),
    }


def test_decontamination_stop_list_and_threshold(spark):
    from deepblocker_spark.operators.dedup import decontamination_pairs

    # "x y z" appears in 3 train docs -> dropped at cap 2 from BOTH sides;
    # containment is then over the reduced eval shingle space
    train = spark.createDataFrame(
        [(1, "x y z p q r"), (2, "x y z"), (3, "x y z"), (4, "p q r s")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(9, "x y z p q r")], ["doc_id", "text"])
    got = {
        (r.train_id, r.eval_id): (r.n_shared, r.containment)
        for r in decontamination_pairs(
            train, ev, n=3, max_train_shingle_df=2
        ).collect()
    }
    # eval shingles after drop: {y z p, z p q, p q r} (x y z gone);
    # train 1 holds all 3; train 4 holds only "p q r"
    assert got == {
        (1, 9): (3, pytest.approx(1.0)),
        (4, 9): (1, pytest.approx(1 / 3)),
    }
    kept = decontamination_pairs(
        train, ev, n=3, max_train_shingle_df=2, threshold=0.5
    ).collect()
    assert {(r.train_id, r.eval_id) for r in kept} == {(1, 9)}


def test_decontamination_short_docs_and_empty_eval(spark):
    from deepblocker_spark.operators.dedup import decontamination_pairs

    train = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    short_ev = spark.createDataFrame([(9, "a b")], ["doc_id", "text"])
    assert decontamination_pairs(train, short_ev, n=3).count() == 0
    empty_ev = spark.createDataFrame([], "doc_id long, text string")
    assert decontamination_pairs(train, empty_ev, n=3).count() == 0


def _decontam_rows(df):
    return sorted(
        (r.train_id, r.eval_id, r.n_shared, round(r.containment, 9))
        for r in df.collect()
    )


def test_bloom_decontamination_parity_with_exact(spark):
    # the bloom prune must be LOSSLESS: byte-identical output to the exact
    # operator on every fixture above, including the hot-cap + threshold one
    from deepblocker_spark.operators.dedup import (
        bloom_decontamination_pairs,
        decontamination_pairs,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "beta gamma delta epsilon"),
            (3, "zeta eta theta iota"),
            (4, "x y z p q r"),
            (5, "x y z"),
            (6, "x y z"),
            (7, "p q r s"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon"), (101, "x y z p q r")],
        ["doc_id", "text"],
    )
    for kw in (
        dict(n=3),
        dict(n=3, max_train_shingle_df=2),
        dict(n=3, max_train_shingle_df=2, threshold=0.5),
        dict(n=4),
    ):
        exact = decontamination_pairs(train, ev, **kw)
        bloom = bloom_decontamination_pairs(train, ev, **kw)
        assert _decontam_rows(bloom) == _decontam_rows(exact), kw
    # tiny bloom (1 bit/item) forces false positives; output must not change
    exact = decontamination_pairs(train, ev, n=3)
    noisy = bloom_decontamination_pairs(train, ev, n=3, bits_per_item=1)
    assert _decontam_rows(noisy) == _decontam_rows(exact)


def test_bloom_decontamination_prunes_and_empty_eval(spark):
    from deepblocker_spark.operators.dedup import (
        _decontam_postings,
        bloom_decontamination_pairs,
    )

    # disjoint-vocab train rows must be dropped BY THE BLOOM (before any
    # join): reach into the pruned posting frame via the same test the
    # operator applies — here we just assert no output and that the exact
    # postings were nonzero (so the prune did the work, not the join)
    train = spark.createDataFrame(
        [(i, f"u{i} v{i} w{i} q{i}") for i in range(1, 30)], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])
    t_inv, _ = _decontam_postings(train, ev, "doc_id", "text", 3, None)
    assert t_inv.count() > 0
    assert bloom_decontamination_pairs(train, ev, n=3).count() == 0

    empty_ev = spark.createDataFrame([], "doc_id long, text string")
    assert bloom_decontamination_pairs(train, empty_ev, n=3).count() == 0


def test_bloom_decontamination_int32_bitmap_regression(spark):
    # regression (review finding): with ONE eval shingle at bits_per_item=1
    # the bitmap is a single word with one low bit set — lit() would infer
    # array<int> and getbit on an int throws for probe positions >= 32.
    # The explicit array<long> cast must keep every probe legal. Sweep
    # seeds-by-content until both <32 and >=32 probe positions occur.
    from deepblocker_spark.operators.dedup import bloom_decontamination_pairs

    ev = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [(i, f"t{i} u{i} v{i}") for i in range(1, 65)] + [(99, "a b c")],
        ["doc_id", "text"],
    )
    got = bloom_decontamination_pairs(train, ev, n=3, bits_per_item=1).collect()
    assert [(r.train_id, r.eval_id) for r in got] == [(99, 9)]


def test_dedup_survivors_keep_first_same_row(spark):
    from deepblocker_spark.operators.dedup import dedup_survivors

    df = spark.createDataFrame(
        [
            (5, "dup", "en", "web"),   # group "dup": survivor id 2
            (2, "dup", "fr", "pdf"),
            (9, "dup", "de", "ocr"),
            (7, "solo", "en", "web"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    got = {
        r.doc_id: (r.lang, r.source, r.dup_count)
        for r in dedup_survivors(
            df, key="text", carry=("lang", "source")
        ).collect()
    }
    # carried attrs must come from the min-id ROW (fr/pdf), not be
    # column-wise minima (de would win a naive min on lang)
    assert got == {2: ("fr", "pdf", 3), 7: ("en", "web", 1)}


def test_dedup_survivors_expression_key_total_rows(spark):
    from deepblocker_spark.operators.dedup import dedup_survivors
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(9)], ["doc_id", "text"]
    )
    out = dedup_survivors(df, key=F.sha2(F.col("text"), 256)).collect()
    assert {r.doc_id for r in out} == {0, 1, 2}
    assert sum(r.dup_count for r in out) == 9

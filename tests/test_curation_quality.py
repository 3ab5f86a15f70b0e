"""Gopher repetition signals + PII redaction (hand-computed fixtures)."""

from __future__ import annotations

import pytest

from deepblocker_spark.operators.textstats import redact_pii, repetition_profile


def test_repetition_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 4 lines, "same line" twice -> dup_line_frac 1 - 3/4
            (1, "same line\nother line\nsame line\nthird line"),
            # tokens: a b a b a -> bigrams [ab, ba, ab, ba] top 2/4;
            # trigrams [aba, bab, aba] -> dup 2/3
            (2, "a b a b a"),
            # no repetition at all
            (3, "one two three four"),
            # single token: no bigrams/trigrams -> 0.0, one line -> 0.0
            (4, "solo"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.asDict() for r in repetition_profile(df).collect()}
    assert got[1]["dup_line_frac"] == pytest.approx(0.25)
    assert got[2]["top_bigram_frac"] == pytest.approx(0.5)
    assert got[2]["dup_trigram_frac"] == pytest.approx(2 / 3)
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == pytest.approx(1 / 3)  # all unique, top=1/3
    assert got[3]["dup_trigram_frac"] == 0.0
    for c in ("dup_line_frac", "top_bigram_frac", "dup_trigram_frac"):
        assert got[4][c] == 0.0
        assert got[5][c] == 0.0


def test_repetition_profile_top_bigram_counts_occurrences(spark):
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] -> "a b" x3 of 5.
    # A distinct-shingle implementation would report 1/2 here.
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    row = repetition_profile(df).collect()[0]
    assert row.top_bigram_frac == pytest.approx(3 / 5)
    # genuine count tie ("a b" x2, "b b" x2, "b a" x1): only the FRACTION
    # is emitted, so the struct-max tie-break cannot change the output
    df2 = spark.createDataFrame([(1, "a b b a b b")], ["doc_id", "text"])
    row2 = repetition_profile(df2).collect()[0]
    assert row2.top_bigram_frac == pytest.approx(2 / 5)


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org or 10.0.42.7 id 123456789"),
            (2, "no pii here, just 1234 short digits"),
            (3, "two mails a@b.io c@d.co and ips 1.2.3.4 5.6.7.8"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_digit_run) == (1, 1, 1)
    assert got[1].redacted == "mail <EMAIL> or <IP> id <NUM>"
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_digit_run) == (0, 0, 0)
    assert got[2].redacted == got[2].text
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_digit_run) == (2, 2, 0)
    assert got[3].redacted == "two mails <EMAIL> <EMAIL> and ips <IP> <IP>"


def test_redact_pii_rejects_colliding_columns(spark):
    """ADVICE r4: a pre-existing n_email/out_col column would silently
    duplicate in select('*', ...) — must raise instead."""
    import pytest

    base = spark.createDataFrame([(1, "x", 9)], ["doc_id", "text", "n_email"])
    with pytest.raises(ValueError, match="n_email"):
        redact_pii(base)
    named = spark.createDataFrame([(1, "x", "y")], ["doc_id", "text", "redacted"])
    with pytest.raises(ValueError, match="redacted"):
        redact_pii(named)
    # a different out_col sidesteps the out_col clash
    ok = redact_pii(named.drop("redacted"), out_col="clean")
    assert "clean" in ok.columns


def test_curation_pipeline_composition(spark):
    """End-to-end curation chain — the canonical pre-training pipeline out
    of this repo's own operators, each stage's output feeding the next:
    PII scrub -> repetition filter -> exact dedup (keep-first) ->
    bloom decontamination vs a held-out eval set. Deterministic fixture,
    exact expected survivor set."""
    from deepblocker_spark.operators.dedup import (
        bloom_decontamination_pairs,
        dedup_survivors,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            # 1: clean, unique, low repetition -> SURVIVES
            (1, "the quick brown fox jumps over one lazy dog today"),
            # 2: PII-bearing but otherwise clean -> survives, redacted
            (2, "write to alice@example.com about the pending invoice now"),
            # 3: degenerate repetition -> dropped by the repetition filter
            (3, "spam spam spam spam spam spam spam spam spam spam"),
            # 4/5: exact duplicates AFTER redaction (differ only in email)
            (4, "ping bob@corp.io for the quarterly revenue numbers"),
            (5, "ping eve@corp.io for the quarterly revenue numbers"),
            # 6: contaminated (shares 3-shingles with the eval doc)
            (6, "held out benchmark sentence appears verbatim here sadly"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "held out benchmark sentence appears verbatim")],
        ["doc_id", "text"],
    )

    from deepblocker_spark.operators.textstats import redact_pii, repetition_profile

    scrubbed = redact_pii(docs).select(
        "doc_id", F.col("redacted").alias("text")
    )
    rep = repetition_profile(scrubbed)
    keep = scrubbed.join(
        rep.filter(
            (F.col("top_bigram_frac") < 0.5) & (F.col("dup_trigram_frac") < 0.5)
        ).select("doc_id"),
        "doc_id",
    )
    survivors = dedup_survivors(keep, F.sha2(F.col("text"), 256), carry=("text",))
    # doc 4 survives (min id of the 4/5 redacted-identical pair)
    contaminated = {
        r.train_id
        for r in bloom_decontamination_pairs(
            survivors, ev, n=3, threshold=0.5
        ).collect()
    }
    final = sorted(
        r.doc_id for r in survivors.collect() if r.doc_id not in contaminated
    )
    assert final == [1, 2, 4]
    # and the PII really was scrubbed before hashing: the survivor pair
    # collapsed BECAUSE redaction removed the differing emails
    surv = {r.doc_id: (r.text, r.dup_count) for r in survivors.collect()}
    assert surv[4][1] == 2 and "<EMAIL>" in surv[4][0]
    assert "<EMAIL>" in surv[2][0]


def test_curation_pipeline_with_round5_dedup_stages(spark):
    """Composition of the round-5 stages into the curation chain: PII
    scrub -> exact-substring near-dup drop (winnowing) -> semantic dedup
    over the docs' embeddings -> exact-span decontamination vs a held-out
    eval set. Deterministic fixture, exact expected survivor set."""
    import numpy as np
    from pyspark.sql import functions as F

    from deepblocker_spark.operators.semdedup import semantic_dedup
    from deepblocker_spark.operators.substring_dedup import (
        exact_substring_pairs,
        exact_substring_pairs_dyadic,
    )
    from deepblocker_spark.operators.textstats import redact_pii

    rng = np.random.Generator(np.random.PCG64(29))
    abc = list("abcdefghij klmnop")
    span = "".join(rng.choice(abc, size=30))
    leak = "".join(rng.choice(abc, size=30))

    def rand(n):
        return "".join(rng.choice(abc, size=n))

    docs = spark.createDataFrame(
        [
            (1, rand(40)),                         # clean -> SURVIVES
            (2, rand(12) + span + rand(9)),        # substring-dup pair ...
            (3, span + rand(20)),                  # ... larger id dropped
            (4, rand(41)),                         # semantic twin, kept (min id)
            (5, rand(42)),                         # semantic twin of 4 -> dropped
            (6, leak + rand(15)),                  # leaks an eval span -> dropped
        ],
        ["doc_id", "text"],
    )
    base = rng.normal(size=(7, 12))
    base[5] = base[4] * 1.001 + 0.0005  # 4/5 are semantic twins
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(1, 7)],
        "doc_id bigint, embedding array<double>",
    )
    ev = spark.createDataFrame([(100, rand(7) + leak)], ["doc_id", "text"])

    scrubbed = redact_pii(docs).select("doc_id", F.col("redacted").alias("text"))
    sub_pairs = exact_substring_pairs(scrubbed, gram_len=10, window=3)
    after_sub = scrubbed.join(
        sub_pairs.select(F.col("b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    verdicts = semantic_dedup(
        emb.join(after_sub.select("doc_id"), "doc_id", "left_semi"),
        id_col="doc_id",
        emb_col="embedding",
        threshold=0.95,
        n_cells=2,
    )
    after_sem = after_sub.join(
        verdicts.filter(F.col("kept")).select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    contaminated = exact_substring_pairs_dyadic(
        after_sem, ev, gram_len=10, window=3
    ).select(F.col("l_id").alias("doc_id")).distinct()
    final = sorted(
        r.doc_id
        for r in after_sem.join(contaminated, "doc_id", "left_anti").collect()
    )
    assert final == [1, 2, 4]

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

"""Tokenizer parity tests (FIXTURES.md F4): the pure-Python, Spark Column,
and DuckDB SQL implementations must agree on torchtext basic_english
semantics (/root/reference/tuple_embedding_models.py:47)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deepblocker_spark.functions.tokenizer import (
    basic_english_tokenize,
    duckdb_tokens_sql,
    tokens_col,
)

# Recorded parity table: (input, expected basic_english tokens)
PARITY = [
    ("Hello World", ["hello", "world"]),
    ("it's a test.", ["it", "'", "s", "a", "test", "."]),
    ('he said "yes"', ["he", "said", "yes"]),
    ("a,b(c)d!e?f", ["a", ",", "b", "(", "c", ")", "d", "!", "e", "?", "f"]),
    ("semi;colon:here", ["semi", "colon", "here"]),
    ("  multiple   spaces  ", ["multiple", "spaces"]),
    ("", []),
    (" ", []),  # the null-imputation value -> zero tokens
    ("...", [".", ".", "."]),
    ("line<br />break", ["line", "break"]),
    ("MiXeD CaSe", ["mixed", "case"]),
    ("price 3.0 usd", ["price", "3", ".", "0", "usd"]),
    ("tab\tand\nnewline", ["tab", "and", "newline"]),
]


@pytest.mark.parametrize("text,expected", PARITY)
def test_python_tokenizer_parity(text, expected):
    assert basic_english_tokenize(text) == expected


def test_python_tokenizer_none():
    assert basic_english_tokenize(None) == []


def test_spark_tokenizer_matches_python(spark):
    texts = [t for t, _ in PARITY]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {r["text"]: r["toks"] for r in df.select("text", tokens_col("text").alias("toks")).collect()}
    for t, expected in PARITY:
        assert got[t] == expected, f"spark mismatch on {t!r}"


def test_duckdb_tokenizer_matches_python():
    con = duckdb.connect()
    sql = f"select {duckdb_tokens_sql('t')} as toks from (select ? as t)"
    for t, expected in PARITY:
        got = con.execute(sql, [t]).fetchone()[0]
        assert got == expected, f"duckdb mismatch on {t!r}"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=60))
def test_duckdb_vs_python_hypothesis(text):
    con = duckdb.connect()
    got = con.execute(
        f"select {duckdb_tokens_sql('t')} from (select ? as t)", [text]
    ).fetchone()[0]
    assert got == basic_english_tokenize(text)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_tokenizer_idempotence(text):
    toks = basic_english_tokenize(text)
    assert basic_english_tokenize(" ".join(toks)) == toks

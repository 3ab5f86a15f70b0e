"""Tokenizer with torchtext ``basic_english`` parity (SURVEY.md O10).

The reference tokenizes with ``get_tokenizer("basic_english")``
(/root/reference/tuple_embedding_models.py:47,89,203). Semantics: lowercase;
pad ``' . , ( ) ! ?`` with spaces; delete ``"``; replace ``<br />``, ``;``,
``:`` and whitespace runs with a single space; split on whitespace.

Three parity-locked implementations share the same pattern table:
  * :func:`basic_english_tokenize` — pure Python, used inside pandas UDFs.
  * :func:`tokens_col` — Spark Column expression (JVM-side, codegen'd), used
    for the frequency/SIF aggregation path so token counting never leaves
    the JVM (SURVEY.md O13).
  * :func:`duckdb_tokens_sql` — DuckDB SQL fragment for the oracle harness.

tests/test_tokenizer.py asserts all three agree on the parity table
(FIXTURES.md F4) and on hypothesis-generated strings.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (regex pattern, replacement) in application order — the exact torchtext
# basic_english normalization table.
PATTERNS: list[tuple[str, str]] = [
    (r"\'", " ' "),
    (r"\"", ""),
    (r"\.", " . "),
    (r"<br \/>", " "),
    (r",", " , "),
    (r"\(", " ( "),
    (r"\)", " ) "),
    (r"\!", " ! "),
    (r"\?", " ? "),
    (r"\;", " "),
    (r"\:", " "),
    # Explicit ASCII whitespace class instead of \s: Python re, Java regex
    # and RE2 disagree on what \s matches (unicode spaces, \x1c-\x1f), and
    # the three implementations must agree bit-for-bit for the oracle gate.
    (r"[ \t\n\r\f\x0b]+", " "),
]

_COMPILED = [(re.compile(p), r) for p, r in PATTERNS]


def basic_english_tokenize(line: str | None) -> list[str]:
    """Pure-Python tokenizer; parity with torchtext basic_english."""
    if line is None:
        return []
    line = line.lower()
    for pattern, replacement in _COMPILED:
        line = pattern.sub(replacement, line)
    # After the whitespace collapse only single spaces remain; split(' ') +
    # drop-empties matches the Column/SQL variants exactly (torchtext uses
    # str.split(), which additionally treats \x1c-\x1f as separators — a
    # documented, vanishingly-rare divergence).
    return [t for t in line.split(" ") if t]


def tokens_col(col: Column | str) -> Column:
    """JVM-side tokenizer as a Column expression (array<string>)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    for pattern, replacement in PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    # After the \s+ collapse only single spaces remain; trim + split + drop
    # empties is equivalent to Python str.split().
    return F.filter(F.split(F.trim(c), " "), lambda t: t != F.lit(""))


def duckdb_tokens_sql(expr: str) -> str:
    """DuckDB SQL fragment producing the same token list (for oracles)."""
    c = f"lower({expr})"
    for pattern, replacement in PATTERNS:
        pat = pattern.replace("'", "''")
        rep = replacement.replace("'", "''")
        c = f"regexp_replace({c}, '{pat}', '{rep}', 'g')"
    return f"list_filter(string_split(trim({c}), ' '), t -> t <> '')"

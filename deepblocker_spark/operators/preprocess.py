"""Relational preprocessing stage (SURVEY.md O3-O9).

Reproduces the reference's table preparation
(/root/reference/deep_blocker.py:12-45) as a single lazy, Catalyst-optimized
projection:

  validate -> project to cols_to_block -> null->' ' (BEFORE string cast,
  so a null becomes ' ' and never 'nan'/'NULL') -> cast all to string ->
  _merged_text = ' '-join of non-id cols in declared order -> keep
  (id, _merged_text).

Everything is built-in Column expressions — whole-stage codegen, column
pruning and pushdown apply for free. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGED_TEXT = "_merged_text"


def validate_columns(df: DataFrame, cols_to_block: list[str], id_col: str = "id") -> list[str]:
    """Reference semantics (deep_blocker.py:12-26): force-append the id
    column if absent, then assert every requested column exists."""
    cols = list(cols_to_block)
    if id_col not in cols:
        cols.append(id_col)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns {missing} not found in DataFrame columns {df.columns}")
    return cols


def string_with_null_as_space(col: str) -> Column:
    """Null imputation *before* cast semantics (deep_blocker.py:33-37):
    fillna(' ') on the original value, then astype(str). Expressed as
    coalesce(cast(c as string), ' ') — a SQL null casts to SQL null (never
    the string 'nan'), so coalescing after the cast is equivalent and stays
    a single JVM expression."""
    return F.coalesce(F.col(col).cast("string"), F.lit(" "))


def preprocess_table(
    df: DataFrame,
    cols_to_block: list[str],
    id_col: str = "id",
) -> DataFrame:
    """-> DataFrame(id_col, _merged_text). Pure projection; one narrow stage."""
    cols = validate_columns(df, cols_to_block, id_col)
    text_cols = [c for c in cols if c != id_col]  # cols_to_block order, id excluded
    merged = F.concat_ws(" ", *[string_with_null_as_space(c) for c in text_cols])
    return df.select(F.col(id_col), merged.alias(MERGED_TEXT))


def build_corpus(left: DataFrame, right: DataFrame) -> DataFrame:
    """Union of both tables' merged text (deep_blocker.py:57)."""
    return left.select(MERGED_TEXT).unionByName(right.select(MERGED_TEXT))

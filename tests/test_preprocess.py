"""Preprocess-stage tests (SURVEY.md O3-O9): null->' '-before-cast
semantics, column order, id handling, corpus union."""

from __future__ import annotations

import pytest

from deepblocker_spark.operators.preprocess import (
    MERGED_TEXT,
    build_corpus,
    preprocess_table,
    validate_columns,
)


def _table(spark):
    return spark.createDataFrame(
        [
            (1, "Apple iPhone", "Apple", 999.0),
            (2, None, "Samsung", None),
            (3, "Pixel 9", None, 599.5),
        ],
        ["id", "title", "manufacturer", "price"],
    )


def test_validate_appends_id(spark):
    df = _table(spark)
    cols = validate_columns(df, ["title", "price"])
    assert cols == ["title", "price", "id"]


def test_validate_missing_column_raises(spark):
    df = _table(spark)
    with pytest.raises(ValueError, match="nope"):
        validate_columns(df, ["title", "nope"])


def test_merged_text_null_becomes_space_not_nan(spark):
    out = preprocess_table(_table(spark), ["title", "manufacturer", "price"])
    rows = {r["id"]: r[MERGED_TEXT] for r in out.collect()}
    # Null title/price -> ' ' (never 'nan'/'None'), deep_blocker.py:33-37
    assert rows[2] == "  Samsung  "
    assert "nan" not in rows[2].lower() and "none" not in rows[2].lower()
    assert rows[1] == "Apple iPhone Apple 999.0"
    assert rows[3] == "Pixel 9   599.5"


def test_merged_text_respects_declared_column_order(spark):
    out = preprocess_table(_table(spark), ["manufacturer", "title"])
    rows = {r["id"]: r[MERGED_TEXT] for r in out.collect()}
    assert rows[1] == "Apple Apple iPhone"


def test_output_schema_is_id_plus_merged_text(spark):
    out = preprocess_table(_table(spark), ["title"])
    assert out.columns == ["id", MERGED_TEXT]


def test_iceberg_format_errors_clearly(spark):
    """No Iceberg runtime jar in this sandbox: the source must fail with an
    actionable error, not a silent fallback."""
    from deepblocker_spark.sources.repo_files import load_repo_table

    with pytest.raises(Exception) as exc:
        load_repo_table(spark, "db.some_table", fmt="iceberg")
    assert "iceberg" in str(exc.value).lower()


def test_corpus_union_counts(spark):
    left = preprocess_table(_table(spark), ["title"])
    right = preprocess_table(_table(spark), ["manufacturer"])
    corpus = build_corpus(left, right)
    assert corpus.count() == 6
    assert corpus.columns == [MERGED_TEXT]

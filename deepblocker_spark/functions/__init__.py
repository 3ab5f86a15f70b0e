from deepblocker_spark.functions.tokenizer import (
    basic_english_tokenize,
    duckdb_tokens_sql,
    tokens_col,
)
from deepblocker_spark.functions.wordvec import HashWordVectors, get_provider

__all__ = [
    "basic_english_tokenize",
    "duckdb_tokens_sql",
    "tokens_col",
    "HashWordVectors",
    "get_provider",
]

from deepblocker_spark.operators.preprocess import (
    MERGED_TEXT,
    build_corpus,
    preprocess_table,
    validate_columns,
)
from deepblocker_spark.operators.embed import (
    EMBEDDING,
    embed_tuples,
    remove_principal_component,
    sif_weights_df,
    token_frequencies,
)
from deepblocker_spark.operators.topk import ExactTopKVectorPairing, exact_topk_join
from deepblocker_spark.operators.metrics import blocking_statistics, pairwise_f1

__all__ = [
    "MERGED_TEXT",
    "EMBEDDING",
    "build_corpus",
    "preprocess_table",
    "validate_columns",
    "embed_tuples",
    "remove_principal_component",
    "sif_weights_df",
    "token_frequencies",
    "ExactTopKVectorPairing",
    "exact_topk_join",
    "blocking_statistics",
    "pairwise_f1",
]

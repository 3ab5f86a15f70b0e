"""deepblocker_spark — a PySpark-native blocking / pairwise-scoring /
transitive-clustering engine with the capabilities of qcri/DeepBlocker
(reference at /root/reference, studied not ported; see SURVEY.md)."""

from deepblocker_spark.config import BlockerConfig, DEFAULT_CONFIG, TEST_CONFIG
from deepblocker_spark.pipeline import (
    DeepBlocker,
    SparkAverageEmbedding,
    SparkAutoEncoderEmbedding,
    SparkCTTEmbedding,
    SparkHybridEmbedding,
    SparkSIFEmbedding,
)
from deepblocker_spark.operators.topk import ExactTopKVectorPairing

__all__ = [
    "BlockerConfig",
    "DEFAULT_CONFIG",
    "TEST_CONFIG",
    "DeepBlocker",
    "SparkAverageEmbedding",
    "SparkAutoEncoderEmbedding",
    "SparkCTTEmbedding",
    "SparkHybridEmbedding",
    "SparkSIFEmbedding",
    "ExactTopKVectorPairing",
]

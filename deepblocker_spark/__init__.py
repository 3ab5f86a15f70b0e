"""deepblocker_spark — a PySpark-native blocking / pairwise-scoring /
transitive-clustering engine with the capabilities of qcri/DeepBlocker
(reference at /root/reference, studied not ported; see SURVEY.md)."""

import os as _os

# numpy >= 1.18 madvises MADV_HUGEPAGE on large allocations; on some kernels
# (including this environment) hugepage faulting runs ~300x slower than base
# pages (measured: 23s vs 0.07s for a 138MB fill). Must be set before numpy
# is imported anywhere in the process.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

from deepblocker_spark.config import BlockerConfig, DEFAULT_CONFIG, TEST_CONFIG
from deepblocker_spark.pipeline import (
    DeepBlocker,
    SparkAverageEmbedding,
    SparkAutoEncoderEmbedding,
    SparkCTTEmbedding,
    SparkHybridEmbedding,
    SparkSIFEmbedding,
)
from deepblocker_spark.operators.ann import IVFVectorPairing
from deepblocker_spark.operators.pq import PQVectorPairing
from deepblocker_spark.operators.lsh import LSHVectorPairing
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
    "LSHVectorPairing",
    "IVFVectorPairing",
    "PQVectorPairing",
]

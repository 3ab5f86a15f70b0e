"""Word-vector providers (SURVEY.md O11).

The reference looks up 300-d fastText vectors
(/root/reference/tuple_embedding_models.py:44,65,70). fastText's wiki.en.bin
is external data and unavailable here, so the hermetic default is a
deterministic hash-projection embedder: each token's vector is drawn from a
PCG64 stream seeded by blake2b(token) — stable across processes, machines,
and runs, which is exactly the property the distributed pipeline needs
(every executor computes identical vectors with zero coordination).

A real fastText backend can be slotted in behind the same interface when the
model file is shipped to executors via ``spark.sparkContext.addFile``.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Per-process cache: token -> vector. Bounded so a web-scale vocabulary
# cannot OOM an executor; eviction is wholesale (cheap, amortized).
_CACHE_CAP = 300_000


class HashWordVectors:
    """Deterministic pseudo-fastText: token -> N(0, 1/dim) vector."""

    def __init__(self, dim: int = 300):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def get_word_vector(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            seed = int.from_bytes(
                hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            rng = np.random.Generator(np.random.PCG64(seed))
            v = rng.standard_normal(self.dim, dtype=np.float32) / np.sqrt(self.dim)
            if len(self._cache) >= _CACHE_CAP:
                self._cache.clear()
            self._cache[token] = v
        return v

    def matrix(self, tokens: list[str]) -> np.ndarray:
        """Vectors for a flat token list -> (n_tokens, dim) float32."""
        if not tokens:
            return np.zeros((0, self.dim), dtype=np.float32)
        # Dedup within the batch: look up each distinct token once.
        uniq: dict[str, int] = {}
        idx = np.empty(len(tokens), dtype=np.int64)
        for i, t in enumerate(tokens):
            j = uniq.get(t)
            if j is None:
                j = len(uniq)
                uniq[t] = j
            idx[i] = j
        vocab_mat = np.stack([self.get_word_vector(t) for t in uniq])
        return vocab_mat[idx]


class FastTextWordVectors:
    """Optional real-fastText backend (same seam as the reference's
    fasttext.load_model usage). Gated behind an import-try because the
    fasttext package and .bin model are not present in this environment."""

    def __init__(self, model_path: str):
        try:
            import fasttext  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "fasttext is not installed; use HashWordVectors instead"
            ) from e
        self._model = fasttext.load_model(model_path)  # pragma: no cover
        self.dim = self._model.get_dimension()  # pragma: no cover

    def get_word_vector(self, token: str) -> np.ndarray:  # pragma: no cover
        return self._model.get_word_vector(token)

    def matrix(self, tokens: list[str]) -> np.ndarray:  # pragma: no cover
        return np.stack([self.get_word_vector(t) for t in tokens]) if tokens else np.zeros((0, self.dim), dtype=np.float32)


# Executor-side singleton registry so mapInPandas closures don't re-create
# providers per batch. Keyed by (kind, dim).
_PROVIDERS: dict[tuple[str, int], HashWordVectors] = {}


def get_provider(dim: int, kind: str = "hash") -> HashWordVectors:
    key = (kind, dim)
    p = _PROVIDERS.get(key)
    if p is None:
        if kind != "hash":
            raise ValueError(f"unknown provider kind {kind!r}")
        p = HashWordVectors(dim)
        _PROVIDERS[key] = p
    return p

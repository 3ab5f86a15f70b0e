"""Deterministic synthetic fixtures (FIXTURES.md F1-F3) — pure functions of
(seed, scale); no external data.

``repo_file_table`` builds the flagship input shape (repo, path, commit,
lang, content) with golden clusters: C base records, 1..m near-duplicate
copies each via the reference's own perturbation recipe (random deletion of
up to 40% of tokens, /root/reference/tuple_embedding_models.py:187-232) plus
case noise. Zipf-skewed repos and ~5% duplicated basenames exercise the
hot-bucket paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB = [
    "def", "class", "import", "return", "self", "value", "index", "result",
    "config", "parse", "stream", "buffer", "token", "cursor", "handle",
    "spawn", "merge", "filter", "reduce", "batch", "shard", "vector",
    "column", "record", "schema", "offset", "commit", "branch", "module",
    "packet", "socket", "thread", "mutex", "cache", "queue", "stack",
]
LANGS = ["python", "java", "go", "js", "md"]
LANG_WEIGHTS = [0.40, 0.25, 0.15, 0.15, 0.05]
COMMON_BASENAMES = ["LICENSE", "setup.py", "README.md", "Makefile"]


def repo_file_table(
    n_clusters: int = 60,
    max_dups: int = 5,
    seed: int = 1234,
    tokens_per_doc: int = 30,
    n_repos: int = 12,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """-> (rows, golden_pairs). rows: repo/path/commit/lang/content +
    hidden _cluster. golden_pairs: every intra-cluster undirected pair
    (a_idx < b_idx by row position; ids resolved after durable-key
    derivation via the _cluster column in tests)."""
    rng = np.random.default_rng(seed)
    # Zipf-ish repo popularity
    repo_w = 1.0 / np.arange(1, n_repos + 1)
    repo_w /= repo_w.sum()

    rows = []
    for c in range(n_clusters):
        base = [
            f"{VOCAB[rng.integers(0, len(VOCAB))]}{rng.integers(0, 9)}"
            for _ in range(tokens_per_doc)
        ] + [f"cluster{c}marker"]
        n_copies = int(rng.integers(1, max_dups + 1))
        for copy_i in range(n_copies):
            toks = list(base)
            if copy_i > 0:
                max_remove = int(len(toks) * 0.4)
                for _ in range(int(rng.integers(0, max_remove + 1))):
                    toks.pop(int(rng.integers(0, len(toks))))
                if rng.random() < 0.3:  # case noise
                    j = int(rng.integers(0, len(toks)))
                    toks[j] = toks[j].upper()
            repo_i = int(rng.choice(n_repos, p=repo_w))
            if rng.random() < 0.05:
                path = COMMON_BASENAMES[int(rng.integers(0, len(COMMON_BASENAMES)))]
            else:
                path = f"src/pkg{int(rng.integers(0, 8))}/file_{c}_{copy_i}.py"
            commit = "".join(rng.choice(list("0123456789abcdef"), size=40))
            lang = str(rng.choice(LANGS, p=LANG_WEIGHTS))
            rows.append(
                {
                    "repo": f"org{repo_i % 4}/repo{repo_i}",
                    "path": path,
                    "commit": commit,
                    "lang": lang,
                    "content": " ".join(toks),
                    "_cluster": c,
                }
            )
    pdf = pd.DataFrame(rows)
    golden = []
    for c, grp in pdf.groupby("_cluster"):
        idx = list(grp.index)
        for i in range(len(idx)):
            for j in range(i + 1, len(idx)):
                golden.append({"a_idx": idx[i], "b_idx": idx[j], "_cluster": c})
    return pdf, pd.DataFrame(golden, columns=["a_idx", "b_idx", "_cluster"])


def dyadic_tables(
    n: int = 50, seed: int = 1234, null_rate: float = 0.1
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """FIXTURES.md F2: tableA/tableB in the DeepMatcher CSV shape (id ==
    row position, preserving the reference's assumption) + golden matches."""
    rng = np.random.default_rng(seed)
    a_rows, b_rows, matches = [], [], []
    for i in range(n):
        title = " ".join(
            f"{VOCAB[rng.integers(0, len(VOCAB))]}{i % 11}" for _ in range(6)
        ) + f" uniq{i}"
        manu = VOCAB[i % len(VOCAB)]
        price = round(float(rng.uniform(1, 1000)), 2)
        a_rows.append({"id": i, "title": title, "manufacturer": manu, "price": price})
        toks = title.split()
        for _ in range(int(rng.integers(0, max(1, int(len(toks) * 0.3))))):
            toks.pop(int(rng.integers(0, len(toks))))
        b_price = price if rng.random() > null_rate else None
        b_rows.append(
            {"id": i, "title": " ".join(toks), "manufacturer": manu, "price": b_price}
        )
        matches.append({"ltable_id": i, "rtable_id": i})
    a = pd.DataFrame(a_rows)
    b = pd.DataFrame(b_rows)
    a.loc[a.sample(frac=null_rate, random_state=seed).index, "title"] = None
    return a, b, pd.DataFrame(matches)

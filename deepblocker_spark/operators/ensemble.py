"""Blocking-ensemble composition: union several blockers' candidate sets
with per-pair provenance (no reference counterpart — qcri/DeepBlocker runs
ONE vector pairing per call, `/root/reference/deep_blocker.py:48-74`; real
ER deployments hedge recall by unioning complementary blockers and keep
the provenance for evaluation and threshold tuning).

One narrow plan: each input frame contributes (a, b, source-literal), a
single union feeds one groupBy on the canonical pair key — no joins, no
per-source shuffles. ``sources`` is sorted so the output is deterministic
and hash-stable regardless of union order or partitioning."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensemble_pairs(
    blockers: dict[str, DataFrame],
    id_a: str = "a",
    id_b: str = "b",
) -> DataFrame:
    """-> (a, b, sources array<string> sorted, n_sources int).

    ``blockers`` maps a source name to a candidate-pair frame carrying the
    two id columns (extra columns — scores, ranks — are dropped: scoring
    an ensemble is the scorer's job, this operator only merges coverage).
    Pair keys are canonicalized (least/greatest) so differently-oriented
    blockers agree on the key.
    """
    if not blockers:
        raise ValueError("ensemble_pairs needs at least one blocker frame")
    parts = []
    for name, df in blockers.items():
        parts.append(
            df.select(
                F.least(F.col(id_a), F.col(id_b)).alias("a"),
                F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
                F.lit(name).alias("_src"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy("a", "b")
        .agg(F.sort_array(F.collect_set("_src")).alias("sources"))
        .withColumn("n_sources", F.size("sources"))
    )

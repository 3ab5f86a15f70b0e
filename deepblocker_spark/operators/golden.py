"""Golden-set ETL (SURVEY.md O28-O30) — the reference's ``process_files``
(/root/reference/blocking_utils.py:40-51): filter labeled splits to
label == 1, union, project the pair columns."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_pairs_from_splits(*splits: DataFrame, label_col: str = "label") -> DataFrame:
    """filter(label == 1) on each split -> union-all -> (ltable_id, rtable_id)."""
    if not splits:
        raise ValueError("at least one split required")
    out = None
    for df in splits:
        part = df.filter(F.col(label_col) == 1)
        out = part if out is None else out.unionByName(part)
    return out.select("ltable_id", "rtable_id")

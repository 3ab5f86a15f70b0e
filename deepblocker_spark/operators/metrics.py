"""Blocking-quality metrics (SURVEY.md O26-O27).

recall = |candidates ∩ golden| / |golden|
cssr   = |candidates| / (N_left * N_right)    (candidate-set-size ratio)

Formulas from /root/reference/blocking_utils.py:24-31. The golden set is
small relative to candidates, so the intersection is a broadcast-hash join.
Everything stays lazy; the result is a single-row DataFrame so the metric
computation itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocking_statistics(
    candidates: DataFrame,
    golden: DataFrame,
    n_left: int,
    n_right: int,
    l_col: str = "l_id",
    r_col: str = "r_id",
    golden_l: str = "ltable_id",
    golden_r: str = "rtable_id",
) -> DataFrame:
    """Single-row DataFrame(left_num_tuples, right_num_tuples, recall, cssr)."""
    g = golden.select(
        F.col(golden_l).alias(l_col), F.col(golden_r).alias(r_col)
    ).dropDuplicates()
    cand = candidates.select(l_col, r_col)
    tp = cand.join(F.broadcast(g), [l_col, r_col], "inner").agg(
        F.count("*").alias("true_positives")
    )
    totals = cand.agg(F.count("*").alias("n_candidates")).crossJoin(
        g.agg(F.count("*").alias("n_golden"))
    )
    return (
        totals.crossJoin(tp)
        .select(
            F.lit(n_left).alias("left_num_tuples"),
            F.lit(n_right).alias("right_num_tuples"),
            (F.col("true_positives") / F.col("n_golden")).alias("recall"),
            (F.col("n_candidates") / (F.lit(n_left) * F.lit(n_right))).alias("cssr"),
            F.col("n_candidates"),
            F.col("n_golden"),
            F.col("true_positives"),
        )
    )


def pairwise_f1(
    predicted: DataFrame,
    golden: DataFrame,
    l_col: str = "l_id",
    r_col: str = "r_id",
) -> DataFrame:
    """Single-row DataFrame(precision, recall, f1) over undirected pairs.
    Target metric per BASELINE.json (pairwise F1 >= 0.99); no reference
    counterpart — the reference only reports blocking recall/cssr."""
    def norm(df: DataFrame) -> DataFrame:
        a, b = F.col(l_col), F.col(r_col)
        return df.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        ).dropDuplicates()

    p = norm(predicted)
    g = norm(golden)
    tp = p.join(g, ["a", "b"], "inner").agg(F.count("*").alias("tp"))
    counts = p.agg(F.count("*").alias("n_pred")).crossJoin(
        g.agg(F.count("*").alias("n_gold"))
    )
    return counts.crossJoin(tp).select(
        (F.col("tp") / F.col("n_pred")).alias("precision"),
        (F.col("tp") / F.col("n_gold")).alias("recall"),
        (
            2
            * F.col("tp")
            / (F.col("n_pred") + F.col("n_gold"))
        ).alias("f1"),
        "tp",
        "n_pred",
        "n_gold",
    )

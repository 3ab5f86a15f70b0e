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


def threshold_sweep(
    scored: DataFrame,
    golden: DataFrame,
    thresholds: list[float],
    l_col: str = "l_id",
    r_col: str = "r_id",
    sim_col: str = "sim",
    golden_l: str = "ltable_id",
    golden_r: str = "rtable_id",
) -> DataFrame:
    """Precision/recall/F1 of the scored pair set against ``golden`` at each
    cut in ``thresholds`` — the PR-curve an ER pipeline logs per run to pick
    its operating point. -> one row per threshold: (threshold, n_pred, tp,
    n_gold, precision, recall, f1), counts long, ratios rounded to 9.

    One pass over the scored pairs: normalize to undirected (least/greatest,
    max sim per pair), LEFT-join the golden flag (plain equi-join — golden
    may be large at scale, AQE broadcasts it when it isn't), explode the
    (tiny, broadcast) threshold grid against each pair's sim, and hash-
    aggregate per threshold. Thresholds that no pair clears still appear
    (zero counts): the grid frame is the left side, so no cut is silently
    dropped. Ratios with zero denominators are NULL (never 0/0) —
    identical case-guards on the oracle side keep the engines aligned.

    f1 is computed as 2*tp/(n_pred+n_gold) — algebraically the harmonic
    mean of precision and recall but free of compounded rounding."""
    a, b = F.col(l_col), F.col(r_col)
    p = (
        scored.select(
            F.least(a, b).alias("a"),
            F.greatest(a, b).alias("b"),
            F.col(sim_col).alias("_sim"),
        )
        .groupBy("a", "b")
        .agg(F.max("_sim").alias("_sim"))
    )
    ga, gb = F.col(golden_l), F.col(golden_r)
    g = (
        golden.select(F.least(ga, gb).alias("a"), F.greatest(ga, gb).alias("b"))
        .dropDuplicates()
        .withColumn("_m", F.lit(1))
    )
    joined = p.join(g, ["a", "b"], "left")
    spark = scored.sparkSession
    th = spark.createDataFrame([(float(t),) for t in thresholds], "threshold double")
    hits = (
        joined.join(F.broadcast(th), F.col("_sim") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count("*").alias("n_pred"),
            F.coalesce(F.sum("_m"), F.lit(0)).alias("tp"),
        )
    )
    n_gold = g.agg(F.count("*").alias("n_gold"))
    out = (
        th.join(hits, "threshold", "left")
        .crossJoin(F.broadcast(n_gold))
        .select(
            "threshold",
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            F.col("n_gold").cast("long").alias("n_gold"),
        )
    )
    return out.select(
        "threshold", "n_pred", "tp", "n_gold",
        F.round(
            F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")), 9
        ).alias("precision"),
        F.round(
            F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")), 9
        ).alias("recall"),
        F.round(
            F.when(
                F.col("n_pred") + F.col("n_gold") > 0,
                2 * F.col("tp") / (F.col("n_pred") + F.col("n_gold")),
            ),
            9,
        ).alias("f1"),
    )

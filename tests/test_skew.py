"""Skew detection + salted repartition tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepblocker_spark.operators.skew import (
    SALT_COL,
    detect_hot_keys,
    key_histogram,
    salted_repartition,
    with_salt,
)


def _skewed(spark):
    hot = [("LICENSE", f"content {i}") for i in range(500)]
    cold = [(f"file{i}.py", f"content {i}") for i in range(50)]
    return spark.createDataFrame(hot + cold, ["path", "content"])


def test_key_histogram_and_hot_detection(spark):
    df = _skewed(spark)
    hist = {r["path"]: r["cnt"] for r in key_histogram(df, "path").collect()}
    assert hist["LICENSE"] == 500
    assert detect_hot_keys(df, "path", hot_threshold=100) == ["LICENSE"]
    assert detect_hot_keys(df, "path", hot_threshold=1000) == []


def test_with_salt_spreads_hot_keys_only(spark):
    df = _skewed(spark)
    salted = with_salt(df, "path", ["LICENSE"], n_salts=8)
    pdf = salted.toPandas()
    hot_salts = set(pdf[pdf["path"] == "LICENSE"][SALT_COL])
    cold_salts = set(pdf[pdf["path"] != "LICENSE"][SALT_COL])
    assert len(hot_salts) == 8  # hot key spread over all salts
    assert cold_salts == {0}  # cold keys co-located
    # deterministic: same content -> same salt
    pdf2 = with_salt(df, "path", ["LICENSE"], n_salts=8).toPandas()
    assert list(pdf.sort_values(["path", "content"])[SALT_COL]) == list(
        pdf2.sort_values(["path", "content"])[SALT_COL]
    )


def test_salted_repartition_balances_partitions(spark):
    df = _skewed(spark)
    def max_partition(frame):
        return (
            frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

    unsalted = df.repartition(8, "path")
    out = salted_repartition(df, "path", hot_threshold=100, n_salts=16,
                             num_partitions=8)
    # without salting one partition holds all 500 LICENSE rows; salting must
    # cut the largest partition substantially (hash collisions among salt
    # groups keep it above the ideal 550/8, but far below the hot-key mass)
    assert max_partition(unsalted) >= 500
    assert max_partition(out) <= 250
    assert out.count() == 550

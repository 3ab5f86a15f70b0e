"""Source for the target input table (BASELINE.json input_hint):
(repo:string, path:string, commit:string, lang:string, content:string).

Primary format is Iceberg (``spark.read.format('iceberg')``) on the real
cluster; plain parquet carries identical schema/semantics in tests (the
Iceberg runtime jar is not in this sandbox — the reader falls back
transparently).

Durable-key derivation replaces the reference's positional-id invariant
(/root/reference/blocking_utils.py:8-12; SURVEY.md §1.3): Spark has no
stable row order, so every row gets id = sha2(repo␟path␟commit) and
content_sha = sha2(content) — the latter carried through all checkpoints to
enforce the per-row sha256-equality invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_COLUMNS = ["repo", "path", "commit", "lang", "content"]
UNIT_SEP = "\x1f"


def with_durable_id(df: DataFrame) -> DataFrame:
    """Content-derived durable key + content sha (input_hint invariant)."""
    return df.withColumn(
        "id",
        F.sha2(F.concat_ws(UNIT_SEP, F.col("repo"), F.col("path"), F.col("commit")), 256),
    ).withColumn("content_sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))


def load_repo_table(
    spark: SparkSession,
    path_or_table: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Read the repo-file table and attach durable keys. ``fmt`` is
    'iceberg' (table identifier) or 'parquet' (path)."""
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path_or_table)
    else:
        df = spark.read.parquet(path_or_table)
    missing = [c for c in REPO_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"repo table missing columns {missing}; has {df.columns}")
    return with_durable_id(df)


def verify_content_sha(df: DataFrame, original: DataFrame) -> DataFrame:
    """Per-row sha256-equality check vs the source (anti-join on id +
    content_sha; empty result == invariant holds)."""
    keys = original.select("id", "content_sha")
    return df.select("id", "content_sha").exceptAll(keys)

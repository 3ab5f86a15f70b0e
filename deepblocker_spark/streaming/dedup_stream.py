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


def stateful_sessionizer(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    state_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key session tracking with a gap rule. Emits a row per CLOSED session
    (closed by a later event beyond the gap, or by state timeout). This is
    the pattern for stateful logic Spark's built-ins can't express —
    arbitrary per-key state carried across micro-batches, with timeouts
    bounding state size.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start_epoch", DoubleType()),
            StructField("session_end_epoch", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_epoch", DoubleType()),
            StructField("last_epoch", DoubleType()),
            StructField("n", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user_id, s, e, n))
                state.remove()
        else:
            events = pd.concat(list(pdfs))
            epochs = (
                events[ts_col].astype("datetime64[us]").astype("int64") / 1e6
            ).sort_values()
            if state.exists:
                s, e, n = state.get
            else:
                s = e = None
                n = 0
            for ep in epochs:
                if s is None:
                    s = e = float(ep)
                    n = 1
                elif ep - e > gap_seconds:
                    closed.append((user_id, s, e, n))
                    s = e = float(ep)
                    n = 1
                else:
                    e = float(ep)
                    n += 1
            state.update((s, e, n))
            state.setTimeoutDuration(state_timeout_ms)
        import pandas as pd  # noqa: F811 — worker-side import

        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_epoch", "session_end_epoch", "n_events"],
        )

    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
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

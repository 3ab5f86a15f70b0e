"""applyInPandasWithState sessionizer test (custom stateful streaming)."""

from __future__ import annotations

import datetime as dt

from deepblocker_spark.streaming.dedup_stream import stateful_sessionizer


def test_stateful_sessionizer_closes_sessions_on_gap(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions separated by a 2-hour gap
        (1, t0, "a"),
        (1, t0 + dt.timedelta(minutes=5), "b"),
        (1, t0 + dt.timedelta(hours=2, minutes=10), "c"),
        # user 2: one session
        (2, t0 + dt.timedelta(minutes=1), "d"),
        (2, t0 + dt.timedelta(minutes=20), "e"),
    ]
    src = spark.createDataFrame(rows, ["user_id", "ts", "payload"])
    path = str(tmp_path / "sess_in")
    src.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = stateful_sessionizer(stream, ts_col="ts", key_col="user_id",
                               gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").toPandas()
    # only user 1's FIRST session is closed within the batch (a later event
    # beyond the gap closes it); open sessions stay in state
    assert len(got) == 1
    r = got.iloc[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 2
    assert r["session_end_epoch"] - r["session_start_epoch"] == 300.0

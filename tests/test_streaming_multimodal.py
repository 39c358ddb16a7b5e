"""Streaming daily agg matches batch; multimodal plumbing round-trips."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_weather_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)
from etl_weather_spark.streaming.daily_stream import (
    daily_stream_agg,
    read_event_stream,
    run_available_now,
)

EVENTS = [
    {"event_id": 1, "ts": "2024-01-01T01:00:00", "user_id": 1, "event_type": "view", "value": 10.0, "props": "{}"},
    {"event_id": 2, "ts": "2024-01-01T05:00:00", "user_id": 2, "event_type": "view", "value": 20.0, "props": "{}"},
    {"event_id": 3, "ts": "2024-01-02T01:00:00", "user_id": 1, "event_type": "click", "value": 5.0, "props": "{}"},
]


def test_streaming_daily_matches_batch(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "part1.json").write_text("\n".join(json.dumps(e) for e in EVENTS))

    stream = read_event_stream(spark, str(src), fmt="json")
    assert stream.isStreaming
    rows = run_available_now(daily_stream_agg(stream), query_name="t_daily_stream")
    by_date = {str(r.date): r for r in rows}
    assert by_date["2024-01-01"].vmin == 10.0
    assert by_date["2024-01-01"].vmax == 20.0
    assert by_date["2024-01-01"].vsum == 30.0
    assert by_date["2024-01-01"].vavg == 15.0
    assert by_date["2024-01-02"].n == 1


def test_multimodal_features(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", ("image/png", 4, 4, None, None)),
        (2, "audio", b"RIFF fake wav", ("audio/wav", None, None, 2500, 16000)),
        (3, "video", b"\x00\x00ftyp fake mp4", ("video/mp4", 640, 480, 3500, None)),
        (4, "image", None, ("image/png", 1, 1, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media)
    got = {r.media_id: r for r in feats.collect()}
    assert got[1].n_bytes == len(b"\x89PNG fake bytes")
    assert len(got[1].feature) == 16
    assert all(0.0 <= v <= 1.0 for v in got[1].feature)
    # deterministic: same payload → same feature/hash
    feats2 = {r.media_id: r for r in extract_features(media).collect()}
    assert feats2[1].content_sha == got[1].content_sha
    assert feats2[1].feature == got[1].feature
    # null payload survives with null feature
    assert got[4].n_bytes == 0 and got[4].feature is None


def test_decode_is_explicit_stub():
    from etl_weather_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"x", "image/png")


def test_decode_true_degrades_gracefully(spark):
    """decode=True in a codec-less container: every row survives with a
    null feature + decode_error instead of the job failing."""
    rows = [
        (1, "image", b"\x89PNG fake bytes", ("image/png", 4, 4, None, None)),
        (4, "image", None, ("image/png", 1, 1, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_features(media, decode=True).collect()}
    assert set(got) == {1, 4}
    assert got[1].feature is None
    assert got[1].decode_error.startswith("NotImplementedError")
    assert got[1].content_sha is not None  # hash path still genuine
    assert got[4].decode_error == "null_payload"


def test_frame_sample_plan(spark):
    rows = [(3, "video", None, ("video/mp4", 640, 480, 3500, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    plan = frame_sample_plan(media, every_ms=1000)
    frames = sorted(r.frame_ms for r in plan.collect())
    assert frames == [0, 1000, 2000, 3000]


def test_media_features_compose_with_ann(spark):
    """End-to-end multimodal → similarity: extract features from media
    payloads, then near-dup detection over the feature vectors — the
    full pipeline shape (decode stub swapped for a real model at
    deploy time; the Spark plumbing is identical)."""
    from pyspark.sql import functions as F

    from etl_weather_spark.operators.similarity import cosine_topk_bruteforce

    rows = [
        (1, "image", b"payload-alpha", ("image/png", 4, 4, None, None)),
        (2, "image", b"payload-alpha", ("image/png", 4, 4, None, None)),  # dup bytes
        (3, "image", b"payload-beta-very-different", ("image/png", 8, 8, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).filter(F.col("feature").isNotNull())
    vecs = feats.select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").cast("array<float>").alias("embedding"),
    )
    top = cosine_topk_bruteforce(vecs, vecs, k=1).collect()
    best = {r.query_id: (r.neighbor_id, r.sim) for r in top}
    # identical payloads → identical features → cosine 1.0 mutual NN
    assert best[1][0] == 2 and abs(best[1][1] - 1.0) < 1e-9
    assert best[2][0] == 1 and abs(best[2][1] - 1.0) < 1e-9
    assert best[3][1] < 1.0


def test_streaming_sliding_window_matches_batch(spark, tmp_path):
    """Sliding windows (10 min / 5 min) give identical results under
    readStream (availableNow) and plain batch — the F.window call is
    shared, only the source differs (queries.sliding_window_volume is
    the batch twin the driver oracle-checks)."""
    src = tmp_path / "slide_src"
    src.mkdir()
    events = [
        {"event_id": i, "ts": f"2024-01-01T00:{mm:02d}:30", "user_id": 1,
         "event_type": "view", "value": float(i + 1), "props": "{}"}
        for i, mm in enumerate([0, 3, 7, 12, 14, 21])
    ]
    (src / "p.json").write_text("\n".join(json.dumps(e) for e in events))

    def slide(df):
        return (
            df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("vsum"))
            .select(F.col("win.start").alias("ws"), "n", "vsum")
        )

    stream = read_event_stream(spark, str(src), fmt="json").withWatermark(
        "ts", "1 hour"
    )
    got = sorted(
        (str(r.ws), r.n, r.vsum)
        for r in run_available_now(slide(stream), query_name="t_slide_stream")
    )
    batch = spark.read.schema(stream.schema).json(str(src))
    exp = sorted((str(r.ws), r.n, r.vsum) for r in slide(batch).collect())
    assert got == exp and len(got) >= 6  # every event in exactly 2 windows


def test_arrow_and_pandas_feature_paths_agree(spark):
    from etl_weather_spark.operators.multimodal import (
        extract_features,
        extract_features_arrow,
    )

    rows = [
        (1, "image", b"\x89PNG fake bytes", ("image/png", 4, 4, None, None)),
        (2, "audio", b"RIFF fake wav", ("audio/wav", None, None, 2500, 16000)),
        (4, "image", None, ("image/png", 1, 1, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    via_pandas = {r.media_id: r for r in extract_features(media).collect()}
    via_arrow = {r.media_id: r for r in extract_features_arrow(media).collect()}
    assert set(via_pandas) == set(via_arrow)
    for k in via_pandas:
        assert via_pandas[k].n_bytes == via_arrow[k].n_bytes
        assert via_pandas[k].content_sha == via_arrow[k].content_sha
        assert via_pandas[k].feature == via_arrow[k].feature

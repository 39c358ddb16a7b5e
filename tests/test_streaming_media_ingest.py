"""Streaming multimodal ingest: perceptual dhash dedup of an image
stream against the standing signature index — stream==batch pair-set
parity over planted near-dup images, plus replay idempotence."""

from __future__ import annotations

import glob

import numpy as np

from etl_weather_spark.operators.dedup import simhash_band_pairs
from etl_weather_spark.operators.multimodal import encode_png, image_dhash
from etl_weather_spark.sources.snapshots import snapshot_history, snapshot_read
from etl_weather_spark.streaming.media_ingest import (
    process_media_batch,
    stream_media_ingest,
)


def _png(seed: int, tweak: int = 0) -> bytes:
    """Deterministic 18x16 RGB image; ``tweak`` nudges a single pixel
    block so tweaked variants stay within a few dhash bits of the
    original while distinct seeds differ everywhere."""
    v = ((seed * 37 + np.arange(16 * 18 * 3, dtype=np.int64) * 29) % 256).astype(
        np.uint8
    ).reshape(16, 18, 3)
    if tweak:
        v[2:4, 2:4, :] = (v[2:4, 2:4, :].astype(np.int64) + 120 * tweak) % 256
    return encode_png(v, filter_types=[y % 5 for y in range(16)])


# batches: 1001 is a tweak of 1 (near-dup), 1002 an exact pixel copy of
# 2 (hamming 0), 3 and 1003 unrelated content
B0 = [(1, _png(1)), (2, _png(2)), (3, _png(3))]
B1 = [(1001, _png(1, tweak=1)), (1002, _png(2)), (1003, _png(9))]


def _write_batch(spark, src, rows, name):
    spark.createDataFrame(rows, "media_id long, payload binary").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/{name}")


def _stream(spark, src):
    return (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )


def test_stream_flags_match_batch_pairs(spark, tmp_path):
    """The union of streamed flags across micro-batches equals the
    batch-mode simhash_band_pairs over the whole corpus: every planted
    near-dup pair is found exactly once (within-batch or cross-index),
    unrelated images are never flagged."""
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "dhash_index")
    flags = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, B0, "b0")
    _write_batch(spark, src, B1, "b1")

    q = stream_media_ingest(
        _stream(spark, src), index_table=idx, flags_dir=flags, checkpoint=ckpt
    )
    q.awaitTermination(180)

    # index recorded every seen signature
    assert {r.media_id for r in snapshot_read(spark, idx).collect()} == {
        1, 2, 3, 1001, 1002, 1003,
    }

    all_media = spark.createDataFrame(
        B0 + B1, "media_id long, payload binary"
    )
    expected = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_band_pairs(
            image_dhash(all_media), id_col="media_id", hot_band_cap=64
        ).collect()
    }
    # the planted relations are actually in play
    assert (2, 1002, 0) in expected
    assert any(a == 1 and b == 1001 for a, b, _h in expected)
    streamed = {
        (r.earlier_id, r.later_id, r.hamming)
        for r in spark.read.parquet(*glob.glob(flags + "/batch_id=*")).collect()
    }
    assert streamed == expected


def test_media_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a committed batch id must change nothing: the commit
    marker short-circuits before either write."""
    idx = str(tmp_path / "dhash_index")
    flags = str(tmp_path / "flags")
    b0 = spark.createDataFrame(B0, "media_id long, payload binary")
    b1 = spark.createDataFrame(B1, "media_id long, payload binary")
    process_media_batch(b0, 0, index_table=idx, flags_dir=flags)
    process_media_batch(b1, 1, index_table=idx, flags_dir=flags)
    before_hist = len(snapshot_history(idx))
    before = {
        (r.earlier_id, r.later_id)
        for r in spark.read.parquet(*glob.glob(flags + "/batch_id=*")).collect()
    }
    # replay both batch ids (at-least-once delivery)
    process_media_batch(b0, 0, index_table=idx, flags_dir=flags)
    process_media_batch(b1, 1, index_table=idx, flags_dir=flags)
    assert len(snapshot_history(idx)) == before_hist
    after = {
        (r.earlier_id, r.later_id)
        for r in spark.read.parquet(*glob.glob(flags + "/batch_id=*")).collect()
    }
    assert after == before
    assert {r.media_id for r in snapshot_read(spark, idx).collect()} == {
        1, 2, 3, 1001, 1002, 1003,
    }
    # cross pair 1<->1001 arrived via the index path in batch 1
    assert (1, 1001) in before

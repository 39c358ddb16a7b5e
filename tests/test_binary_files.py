"""binaryFile ingestion → multimodal schema → feature extraction."""

from __future__ import annotations

import hashlib

from etl_weather_spark.operators.multimodal import extract_features
from etl_weather_spark.sources.binary_files import read_binary_dir, to_media_table


def _make_files(root):
    (root / "shard0").mkdir()
    (root / "shard1").mkdir()
    payloads = {
        "shard0/a.png": b"\x89PNG fake image bytes",
        "shard0/b.wav": b"RIFF fake audio bytes" * 10,
        "shard1/c.mp4": b"\x00\x00ftyp fake video",
        "shard1/notes.txt": b"not media",
    }
    for rel, data in payloads.items():
        (root / rel).write_bytes(data)
    return payloads


def test_binary_dir_to_media_table(spark, tmp_path):
    payloads = _make_files(tmp_path)
    media = to_media_table(read_binary_dir(spark, str(tmp_path)))
    rows = {r.source_path.rsplit("/", 2)[-2] + "/" + r.source_path.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == set(payloads)
    assert rows["shard0/a.png"].modality == "image"
    assert rows["shard0/a.png"].meta.mime == "image/png"
    assert rows["shard0/b.wav"].modality == "audio"
    assert rows["shard1/c.mp4"].modality == "video"
    assert rows["shard1/notes.txt"].modality == "binary"
    # payload arrives byte-exact
    assert bytes(rows["shard0/a.png"].payload) == payloads["shard0/a.png"]
    # media_id is stable across re-reads (path-hash)
    again = {r.source_path: r.media_id for r in to_media_table(read_binary_dir(spark, str(tmp_path))).collect()}
    assert {r.source_path: r.media_id for r in media.collect()} == again


def test_glob_prunes_at_listing(spark, tmp_path):
    _make_files(tmp_path)
    only_png = read_binary_dir(spark, str(tmp_path), glob="*.png")
    assert only_png.count() == 1


def test_ingested_rows_feed_feature_extraction(spark, tmp_path):
    payloads = _make_files(tmp_path)
    media = to_media_table(read_binary_dir(spark, str(tmp_path), glob="*.{png,wav,mp4}"))
    feats = {r.content_sha: r for r in extract_features(media.drop("source_path")).collect()}
    assert len(feats) == 3
    sha = hashlib.sha256(payloads["shard0/b.wav"]).hexdigest()
    assert sha in feats
    assert len(feats[sha].feature) == 16

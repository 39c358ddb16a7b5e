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


def _make_png(width: int, height: int, bit_depth: int = 8, color_type: int = 6) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _make_wav(n_channels: int, sample_rate: int, bits: int, n_frames: int) -> bytes:
    import struct

    data_bytes = n_frames * n_channels * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH",
        16, 1, n_channels, sample_rate,
        sample_rate * n_channels * bits // 8,
        n_channels * bits // 8, bits,
    )
    hdr += b"data" + struct.pack("<I", data_bytes)
    return hdr + b"\x00" * data_bytes


def test_png_wav_header_decode_is_real(spark):
    """Format-header metadata decode is NOT stubbed: real PNG/WAV bytes
    parse JVM-side (substring + hex arithmetic), wrong-magic payloads
    yield null structs."""
    from etl_weather_spark.operators.multimodal import probe_media_meta

    rows = [
        (0, "image", _make_png(640, 480)),
        (1, "image", _make_png(12, 3456, bit_depth=16, color_type=2)),
        (2, "audio", _make_wav(2, 44100, 16, 44100)),   # 1 s stereo CD
        (3, "audio", _make_wav(1, 8000, 8, 4000)),      # 0.5 s mono phone
        (4, "video", b"\x00\x01\x02 not a media header at all" + b"\x00" * 64),
    ]
    media = spark.createDataFrame(rows, "media_id long, modality string, payload binary")
    out = {r.media_id: r for r in probe_media_meta(media).collect()}

    assert (out[0].png_meta.width, out[0].png_meta.height) == (640, 480)
    assert out[0].png_meta.bit_depth == 8 and out[0].png_meta.color_type == 6
    assert (out[1].png_meta.width, out[1].png_meta.height) == (12, 3456)
    assert out[1].png_meta.bit_depth == 16

    wav = out[2].wav_meta
    assert (wav.n_channels, wav.sample_rate, wav.bits_per_sample) == (2, 44100, 16)
    assert wav.data_bytes == 44100 * 2 * 2 and wav.duration_ms == 1000
    wav2 = out[3].wav_meta
    assert (wav2.n_channels, wav2.sample_rate, wav2.duration_ms) == (1, 8000, 500)

    # wrong magic -> null structs, never a throw
    assert out[4].png_meta is None and out[4].wav_meta is None
    assert out[0].wav_meta is None and out[2].png_meta is None

    # the whole probe is Catalyst expressions — no Python in the plan
    plan = probe_media_meta(media)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

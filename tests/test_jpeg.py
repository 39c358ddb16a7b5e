"""Baseline JPEG codec (operators/jpeg.py) — spec-level unit tests.

The exactness anchor (constant 8×8 blocks + dc_quant=8 round-trip
bit-for-bit) is what the media_jpeg_stats oracle relies on; everything
else pins the decoder's spec behavior: quantization-bounded loss on
general content, 4:2:0 upsampling, restart-marker resync, honest
NotImplementedError scope for progressive/16-bit streams.
"""

import numpy as np
import pytest

from etl_weather_spark.operators.jpeg import (
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _DC_LUM_BITS,
    _DC_LUM_VALS,
    _build_canonical,
    decode_jpeg,
    encode_jpeg_baseline,
)


def _block_img(rng, hb, wb, channels=None):
    """Constant-per-8×8-block image (the integer-exact regime)."""
    shape = (hb, wb) if channels is None else (hb, wb, channels)
    blocks = rng.integers(0, 256, size=shape, dtype=np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)


def test_constant_block_gray_roundtrip_exact():
    rng = np.random.default_rng(7)
    img = _block_img(rng, 3, 5)
    out = decode_jpeg(encode_jpeg_baseline(img, quant=16, dc_quant=8))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_general_gray_q1_within_one():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(24, 16), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quant=1))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_rgb_444_roundtrip_tolerance():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quant=1))
    assert out.shape == img.shape
    # q=1 loss is only the YCbCr double rounding: a few LSBs
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.max() <= 5
    assert d.mean() < 1.0


def test_420_subsampled_constant_mcu():
    rng = np.random.default_rng(10)
    mb = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(mb, 16, axis=0), 16, axis=1)
    out = decode_jpeg(encode_jpeg_baseline(img, quant=16, dc_quant=8, subsample=True))
    assert out.shape == img.shape
    # constant chroma per MCU: only the color-transform rounding remains
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_420_general_content_decodes():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quant=1, subsample=True))
    assert out.shape == img.shape
    # luma is full-res at q=1: the Y plane reconstructs tightly even
    # though chroma is subsampled 2x2
    y_in = np.floor(
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2] + 0.5
    )
    y_out = np.floor(
        0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2] + 0.5
    )
    assert np.abs(y_in - y_out).mean() < 3.0


def test_restart_markers_resync():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    data = encode_jpeg_baseline(img, quant=1, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    # restart + 4:2:0 interleaved MCUs
    img3 = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out3 = decode_jpeg(encode_jpeg_baseline(img3, quant=1, subsample=True, restart_interval=2))
    assert out3.shape == img3.shape


def test_progressive_sof2_raises():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg_baseline(img))
    idx = bytes(data).index(b"\xff\xc0")
    data[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(data))


def test_16bit_quant_table_raises():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg_baseline(img))
    idx = bytes(data).index(b"\xff\xdb")
    data[idx + 4] = 0x10  # Pq=1: 16-bit precision table
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bytes(data))


def test_bad_signature_and_dims_validation():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")
    with pytest.raises(ValueError, match="multiple-of-8"):
        encode_jpeg_baseline(np.zeros((10, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="multiple-of-16"):
        encode_jpeg_baseline(np.zeros((24, 24, 3), dtype=np.uint8), subsample=True)


def test_annex_k_tables_are_canonical_prefix_free():
    for bits, vals in ((_DC_LUM_BITS, _DC_LUM_VALS), (_AC_LUM_BITS, _AC_LUM_VALS)):
        assert sum(bits) == len(vals)
        decode_map, encode_map = _build_canonical(bits, vals)
        assert len(encode_map) == len(vals)
        # prefix-free: no code (as a bitstring) is a prefix of another
        bitstrings = [
            format(code, f"0{length}b") for (length, code) in decode_map
        ]
        assert len(set(bitstrings)) == len(bitstrings)
        for a in bitstrings:
            for b in bitstrings:
                if a is not b:
                    assert not b.startswith(a) or a == b


def test_decode_media_dispatches_jpeg():
    from etl_weather_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(13)
    img = _block_img(rng, 2, 2)
    decoded = decode_media(encode_jpeg_baseline(img, quant=16, dc_quant=8), "image/jpeg")
    assert decoded["modality"] == "image"
    assert decoded["pixels"].shape == (16, 16, 1)
    assert np.array_equal(decoded["pixels"][:, :, 0], img)


def test_pixel_stats_magic_dispatch_matches_formula(spark):
    """The mapInPandas pixel_stats path computes exact stats over the
    JPEG-decoded pixels (the media_jpeg_stats in-plan contract)."""
    import pandas as pd

    from etl_weather_spark.operators.multimodal import pixel_stats

    rows = []
    expect = {}
    for did in range(4):
        wb, hb = 2 + did % 4, 1 + did % 3
        v = ((did * 7 + np.arange(wb * hb, dtype=np.int64) * 29) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(v.reshape(hb, wb), 8, axis=0), 8, axis=1)
        rows.append((did, bytearray(encode_jpeg_baseline(img, quant=16, dc_quant=8))))
        flat = img.astype(np.int64).ravel()
        expect[did] = (int(flat.sum()), int((flat * flat).sum()), int(flat.min()), int(flat.max()))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in pixel_stats(media).collect()}
    assert set(out) == set(expect)
    for did, (s, ss, mn, mx) in expect.items():
        r = out[did]
        assert (r.px_sum, r.px_sqsum, r.px_min, r.px_max) == (s, ss, mn, mx)
        assert r.channels == 1


def test_bit_io_linear_on_large_image():
    """Bit reader/writer must mask consumed bits out of their Python
    ints — unmasked they grow per byte and codec time goes quadratic
    (round-6 review: 8.8 s to decode 256x256; linear is ~0.2 s)."""
    import time

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(256, 256), dtype=np.uint8)
    t0 = time.perf_counter()
    data = encode_jpeg_baseline(img, quant=1)
    out = decode_jpeg(data)
    elapsed = time.perf_counter() - t0
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    assert elapsed < 3.0, f"codec went superlinear: {elapsed:.2f}s"


def test_truncated_streams_raise_value_error():
    """Every truncation point raises the documented ValueError, never
    IndexError/struct.error (decode_media's contract)."""
    img = np.zeros((8, 8), dtype=np.uint8)
    data = encode_jpeg_baseline(img)
    for cut in (3, 4, 5, 10, len(data) // 2):
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xff")  # fill bytes to EOF

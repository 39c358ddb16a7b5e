"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side design is fully real — schemas, partition-aware batch
processing via ``mapInPandas`` (Arrow-batched), typed metadata struct,
deterministic fake feature extraction — while the actual media decode is
stubbed: the codec libraries (Pillow, ffmpeg, torchaudio) are not in
this container. Every stub is clearly marked and the interface is what a
real decoder would implement.

Scale notes:
- binary payloads ride in the same row as their metadata; Parquet stores
  them as byte arrays with page-level compression. Partition by
  (modality, shard) so a 100 TB corpus fans out evenly and a
  feature-extract job reads only the modality it needs.
- ``mapInPandas`` streams Arrow record batches — peak executor memory is
  one batch of payloads, not one partition; cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
  megabytes each.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

#: schema when ``decode=True``: adds a per-row decode error so missing
#: codecs degrade to null features instead of failing the job
DECODED_FEATURE_SCHEMA = T.StructType(
    list(FEATURE_SCHEMA.fields) + [T.StructField("decode_error", T.StringType())]
)


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """STUB: real decode (Pillow/ffmpeg) is unavailable in this container.

    A production deployment replaces this with the actual codec call;
    everything around it (batching, schema, partitioning) is already the
    real pipeline.
    """
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: 16 floats
    derived from the sha256 digest. Keeps the pipeline testable and
    byte-for-byte reproducible without codec libraries."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(
    media: DataFrame, batch_hint: int = 64, decode: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Real plumbing, fake decode: byte length + content hash are genuine;
    ``feature`` comes from :func:`_fake_feature` where a real model
    would consume :func:`decode_media` output.

    With ``decode=True`` the real :func:`decode_media` path is attempted
    per row and degrades gracefully: a failed decode (missing codecs, a
    corrupt payload) yields a null ``feature`` plus a ``decode_error``
    string instead of failing the whole job — at 100 TB a single bad
    payload must never kill a stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)).astype("int32"),
                "content_sha": payloads.map(
                    lambda p: None if p is None else hashlib.sha256(p).hexdigest()
                ),
            }
            if decode:
                feats, errs = [], []
                for payload, mime in zip(payloads, pdf["meta"].map(
                    lambda m: None if m is None else m.get("mime")
                )):
                    if payload is None:
                        feats.append(None)
                        errs.append("null_payload")
                        continue
                    try:
                        decode_media(payload, mime)
                        feats.append(_fake_feature(payload))
                        errs.append(None)
                    except Exception as ex:  # noqa: BLE001 — per-row isolation
                        feats.append(None)
                        errs.append(f"{type(ex).__name__}: {ex}"[:200])
                out["feature"] = feats
                out["decode_error"] = errs
            else:
                out["feature"] = payloads.map(
                    lambda p: None if p is None else _fake_feature(p)
                )
            yield pd.DataFrame(out)

    schema = DECODED_FEATURE_SCHEMA if decode else FEATURE_SCHEMA
    return media.mapInPandas(run, schema=schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp.

    Pure Spark (sequence + explode) — produces the work-list a decode
    stage would consume; the decode itself is the stub above.
    """
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """`mapInArrow` variant of :func:`extract_features`: consumes raw
    ``pyarrow.RecordBatch``es, skipping the Arrow→pandas conversion.

    For binary-heavy columns the pandas hop costs a per-cell Python
    bytes materialization on BOTH edges; pure-Arrow batches keep the
    payload buffers zero-copy until the hash actually reads them. Same
    outputs bit-for-bit as the pandas path (asserted in tests); prefer
    this one when payloads dominate batch size.
    """
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            media_ids = batch.column("media_id")
            modalities = batch.column("modality")
            payloads = batch.column("payload").to_pylist()
            n_bytes = [0 if p is None else len(p) for p in payloads]
            shas = [
                None if p is None else hashlib.sha256(p).hexdigest()
                for p in payloads
            ]
            feats = [None if p is None else _fake_feature(p) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    media_ids,
                    modalities,
                    pa.array(n_bytes, type=pa.int32()),
                    pa.array(shas, type=pa.string()),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                names=["media_id", "modality", "n_bytes", "content_sha", "feature"],
            )

    return media.mapInArrow(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL header metadata decode — pure byte arithmetic, no codec libraries.
# The container lacks Pillow/ffmpeg for pixel/sample decode (stubbed
# above), but container FORMAT headers are just bytes: PNG's IHDR chunk
# and WAV's RIFF fmt chunk parse with substring + hex→int conversion,
# entirely JVM-side Catalyst expressions (codegen'd, no Python).
# ---------------------------------------------------------------------------


def _be_uint(payload, offset_1based: int, nbytes: int):
    """Big-endian unsigned int from ``nbytes`` at 1-based ``offset``."""
    return F.conv(F.hex(F.substring(payload, offset_1based, nbytes)), 16, 10).cast(
        "long"
    )


def _le_uint(payload, offset_1based: int, nbytes: int):
    """Little-endian unsigned int: per-byte reads recombined by weight
    (hex() of a multi-byte slice would read big-endian)."""
    out = None
    for i in range(nbytes):
        b = F.conv(F.hex(F.substring(payload, offset_1based + i, 1)), 16, 10).cast(
            "long"
        ) * F.lit(256**i)
        out = b if out is None else out + b
    return out


def png_header_meta(payload):
    """struct(width, height, bit_depth, color_type) decoded from a PNG
    IHDR chunk — null when the 8-byte PNG signature doesn't match.

    Layout (PNG spec, RFC 2083): signature bytes 1-8, IHDR length 9-12,
    'IHDR' 13-16, width BE u32 @17, height BE u32 @21, bit depth @25,
    color type @26 (1-based offsets).
    """
    is_png = F.hex(F.substring(payload, 1, 8)) == F.lit("89504E470D0A1A0A")
    meta = F.struct(
        _be_uint(payload, 17, 4).cast("int").alias("width"),
        _be_uint(payload, 21, 4).cast("int").alias("height"),
        _be_uint(payload, 25, 1).cast("int").alias("bit_depth"),
        _be_uint(payload, 26, 1).cast("int").alias("color_type"),
    )
    return F.when(is_png & (F.length(payload) >= 26), meta)


def wav_header_meta(payload):
    """struct(n_channels, sample_rate, bits_per_sample, data_bytes,
    duration_ms) decoded from a canonical 44-byte RIFF/WAVE header —
    null when the RIFF/WAVE magics don't match.

    Layout (canonical PCM): 'RIFF' @1, 'WAVE' @9, 'fmt ' @13, channels
    LE u16 @23, sample rate LE u32 @25, block align LE u16 @33, bits
    LE u16 @35, 'data' @37, data size LE u32 @41 (1-based offsets).
    """
    is_wav = (
        (F.substring(payload, 1, 4).cast("string") == "RIFF")
        & (F.substring(payload, 9, 4).cast("string") == "WAVE")
        & (F.substring(payload, 37, 4).cast("string") == "data")
    )
    n_channels = _le_uint(payload, 23, 2).cast("int")
    sample_rate = _le_uint(payload, 25, 4).cast("int")
    bits = _le_uint(payload, 35, 2).cast("int")
    data_bytes = _le_uint(payload, 41, 4).cast("long")
    bytes_per_sec = (
        sample_rate.cast("long") * n_channels.cast("long") * (bits / F.lit(8)).cast("long")
    )
    duration_ms = F.when(
        bytes_per_sec > 0, (data_bytes * 1000 / bytes_per_sec).cast("int")
    )
    meta = F.struct(
        n_channels.alias("n_channels"),
        sample_rate.alias("sample_rate"),
        bits.alias("bits_per_sample"),
        data_bytes.alias("data_bytes"),
        duration_ms.alias("duration_ms"),
    )
    return F.when(is_wav & (F.length(payload) >= 44), meta)


def probe_media_meta(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media + ``png_meta``/``wav_meta`` struct columns — the real
    (codec-free) slice of metadata extraction: format headers parse as
    plain Catalyst byte arithmetic, so this runs JVM-side at full scan
    speed; only pixel/sample DECODE needs the stubbed codec path.
    """
    p = F.col(payload_col)
    return media.withColumns(
        {"png_meta": png_header_meta(p), "wav_meta": wav_header_meta(p)}
    )

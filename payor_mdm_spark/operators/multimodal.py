"""Multimodal column plumbing (image/audio/video as opaque binary).

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the codec work itself is stubbed because
media libraries are not available in this environment. Each stub either
raises NotImplementedError (``strict=True``) or produces a deterministic
fake derived from the bytes (default — lets pipelines and tests exercise
the full plumbing).

Operators run through ``mapInPandas`` so each Arrow batch is decoded once
per executor task, which is the right shape for real decoders too (batch
amortizes codec init; binary stays off the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector derived from the payload bytes
    (replace with a real decoder+model in production)."""
    import hashlib

    out = []
    h = payload or b""
    seed = hashlib.sha256(h).digest()
    for i in range(dim):
        b = seed[(i * 4) % 32 : (i * 4) % 32 + 4]
        out.append(int.from_bytes(b, "little") / 2**32 - 0.5)
    return out


def decode_and_featurize_images(
    media: DataFrame, dim: int = 16, strict: bool = False
) -> DataFrame:
    """image rows -> feature vectors via mapInPandas (Arrow-batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decoding requires a codec library not present in "
                    "this environment; wire a real decoder here"
                )
            rows = {
                "media_id": pdf["media_id"],
                "width": pdf["meta"].map(lambda m: (m or {}).get("width")),
                "height": pdf["meta"].map(lambda m: (m or {}).get("height")),
                "features": pdf["payload"].map(lambda p: _fake_features(p, dim)),
            }
            yield pd.DataFrame(rows)

    imgs = media.filter(F.col("kind") == "image")
    return imgs.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", LongType()),
        StructField("frame_hash", LongType()),
    ]
)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """video rows -> sampled frame index rows (1 row per sampled frame)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError("video decoding not available here")
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame_hash": []}
            # column-wise batch fold (no iterrows); the inner loop is per
            # sampled FRAME, which is the output cardinality
            for media_id, meta, payload in zip(
                pdf["media_id"].tolist(), pdf["meta"].tolist(), pdf["payload"].tolist()
            ):
                dur = (meta or {}).get("duration_ms") or 0
                payload = payload or b""
                n = max(1, int(dur // every_ms))
                for i in range(n):
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    h = hashlib.sha256(payload + i.to_bytes(4, "little")).digest()[:8]
                    out["frame_hash"].append(
                        int.from_bytes(h, "little", signed=True)
                    )
            yield pd.DataFrame(out)

    vids = media.filter(F.col("kind") == "video")
    return vids.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-native metadata rollup (no decode): payload sizes per kind."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.col("payload"))).alias("total_bytes"),
        F.avg(F.length(F.col("payload"))).alias("avg_bytes"),
    )


# ---------------------------------------------------------------------------
# Real header sniffing (no codec library needed): PNG IHDR, JPEG SOFn
# markers, GIF logical screen descriptor are fixed byte layouts, so the
# decode-METADATA step is genuinely implemented — only pixel decode /
# model featurization remain stubbed.
# ---------------------------------------------------------------------------

IMAGE_HEADER_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime_detected", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("header_ok", StringType()),  # ok | truncated | unknown
    ]
)


def sniff_image_header(b: bytes | None) -> tuple[str | None, int | None, int | None, str]:
    """Parse (mime, width, height, status) from raw image bytes.

    Pure byte-layout parsing: PNG 8-byte magic + IHDR at offset 16; JPEG
    segment walk to the first SOF0-SOF3 frame header; GIF87a/89a logical
    screen descriptor. Anything else -> ('unknown')."""
    b = b or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 24:
            return (
                "image/png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
                "ok",
            )
        return "image/png", None, None, "truncated"
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                return (
                    "image/jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                    "ok",
                )
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if seglen < 2:
                break
            i += 2 + seglen
        return "image/jpeg", None, None, "truncated"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) >= 10:
            return (
                "image/gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
                "ok",
            )
        return "image/gif", None, None, "truncated"
    return None, None, None, "unknown"


def sniff_image_headers(media: DataFrame) -> DataFrame:
    """image rows -> parsed header metadata via mapInPandas. This is the
    real (non-stubbed) half of the decode step: container metadata from
    byte layout, Arrow-batched, payload never touches the driver."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(sniff_image_header)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_detected": parsed.map(lambda t: t[0]),
                    "width": parsed.map(lambda t: t[1]).astype("Int32"),
                    "height": parsed.map(lambda t: t[2]).astype("Int32"),
                    "header_ok": parsed.map(lambda t: t[3]),
                }
            )

    imgs = media.filter(F.col("kind") == "image")
    return imgs.mapInPandas(fn, IMAGE_HEADER_SCHEMA)


AUDIO_HEADER_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime_detected", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("header_ok", StringType()),
    ]
)


def sniff_wav_header(
    b: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None, str]:
    """Parse (mime, channels, sample_rate, bits, duration_ms, status) from
    RIFF/WAVE bytes: walk the chunk list to 'fmt ' (PCM layout) and 'data'
    (payload size -> duration). Pure byte layout, no codec library."""
    b = b or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None, None, None, None, None, "unknown"
    i = 12
    channels = rate = bits = block_align = None
    data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= len(b):
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            block_align = int.from_bytes(b[i + 20 : i + 22], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or not rate:
        return "audio/wav", None, None, None, None, "truncated"
    duration_ms = None
    if data_size is not None and block_align:
        duration_ms = (data_size * 1000) // (rate * block_align)
    return "audio/wav", channels, rate, bits, duration_ms, "ok"


def sniff_audio_headers(media: DataFrame) -> DataFrame:
    """audio rows -> parsed WAV header metadata via mapInPandas (the real
    half of the audio decode step; sample decode stays stubbed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(sniff_wav_header)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_detected": parsed.map(lambda t: t[0]),
                    "channels": parsed.map(lambda t: t[1]).astype("Int32"),
                    "sample_rate": parsed.map(lambda t: t[2]).astype("Int32"),
                    "bits_per_sample": parsed.map(lambda t: t[3]).astype("Int32"),
                    "duration_ms": parsed.map(lambda t: t[4]).astype("Int64"),
                    "header_ok": parsed.map(lambda t: t[5]),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        fn, AUDIO_HEADER_SCHEMA
    )

"""Multimodal column plumbing (image/audio/video as opaque binary).

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Container METADATA parsing is genuinely
implemented from byte layout (PNG/JPEG/GIF headers, RIFF/WAVE chunk walk,
MPEG audio frame headers, MP4/ISO-BMFF box walk); only the sample/pixel
DECODE step is stubbed because codec libraries are not available in this
environment. Each stub either raises NotImplementedError (``strict=True``)
or produces a deterministic fake derived from the bytes (default — lets
pipelines and tests exercise the full plumbing).

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


# MPEG audio frame-header tables (ISO/IEC 11172-3): Layer III bitrates in
# kbps by version, and sample rates by version — index 3 is reserved
_MP3_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def sniff_mp3_header(
    b: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None, str]:
    """Parse (mime, channels, sample_rate, bits=None, duration_ms, status)
    from MPEG audio bytes: skip an optional ID3v2 tag (syncsafe size),
    find the first frame sync (11 set bits), decode version / layer /
    bitrate / sample-rate / channel-mode fields, and estimate duration
    from the remaining payload at the frame's (CBR) bitrate. Pure byte
    layout, no codec library — same class as the WAV chunk walk."""
    b = b or b""
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        i = 10 + (
            ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        )
    # scan for frame sync — tolerates leading junk/padding
    while i + 4 <= len(b):
        if b[i] == 0xFF and (b[i + 1] & 0xE0) == 0xE0:
            break
        i += 1
    if i + 4 > len(b):
        return None, None, None, None, None, "unknown"
    version = (b[i + 1] >> 3) & 3          # 0=MPEG2.5, 2=MPEG2, 3=MPEG1
    layer = (b[i + 1] >> 1) & 3            # 1=Layer III
    if version == 1 or layer == 0:
        return "audio/mpeg", None, None, None, None, "truncated"
    rate_idx = (b[i + 2] >> 2) & 3
    if rate_idx == 3:
        return "audio/mpeg", None, None, None, None, "truncated"
    rate = _MP3_RATES[version][rate_idx]
    channels = 1 if ((b[i + 3] >> 6) & 3) == 3 else 2
    duration_ms = None
    if layer == 1:  # Layer III: bitrate table -> CBR duration estimate
        br_idx = (b[i + 2] >> 4) & 15
        table = _MP3_BITRATE_V1_L3 if version == 3 else _MP3_BITRATE_V2_L3
        if 0 < br_idx < 15 and table[br_idx]:
            duration_ms = ((len(b) - i) * 8) // table[br_idx]
    return "audio/mpeg", channels, rate, None, duration_ms, "ok"


def sniff_flac_header(
    b: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None, str]:
    """Parse (mime, channels, sample_rate, bits, duration_ms, status) from
    FLAC bytes: 'fLaC' magic, then the metadata-block list to STREAMINFO
    (type 0), whose tail packs sample-rate(20b) / channels-1(3b) /
    bits-1(5b) / total-samples(36b) into one big-endian 64-bit field. Pure
    byte layout, no codec library."""
    b = b or b""
    if b[:4] != b"fLaC":
        return None, None, None, None, None, "unknown"
    i = 4
    while i + 4 <= len(b):
        block_type = b[i] & 0x7F
        last = bool(b[i] & 0x80)
        size = int.from_bytes(b[i + 1 : i + 4], "big")
        s = i + 4
        if block_type == 0:  # STREAMINFO
            if s + 18 > len(b):
                return "audio/flac", None, None, None, None, "truncated"
            packed = int.from_bytes(b[s + 10 : s + 18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if not rate:
                return "audio/flac", None, None, None, None, "truncated"
            duration_ms = (total * 1000) // rate if total else None
            return "audio/flac", channels, rate, bits, duration_ms, "ok"
        if last:
            break
        i = s + size
    return "audio/flac", None, None, None, None, "truncated"


def sniff_audio_header(
    b: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None, str]:
    """Container dispatch: RIFF/WAVE chunk walk, FLAC STREAMINFO, else
    MPEG frame sync."""
    wav = sniff_wav_header(b)
    if wav[0] is not None:
        return wav
    flac = sniff_flac_header(b)
    if flac[0] is not None:
        return flac
    return sniff_mp3_header(b)


def sniff_audio_headers(media: DataFrame) -> DataFrame:
    """audio rows -> parsed WAV/MP3 header metadata via mapInPandas (the
    real half of the audio decode step; sample decode stays stubbed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(sniff_audio_header)
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


VIDEO_HEADER_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime_detected", StringType()),
        StructField("major_brand", StringType()),
        StructField("duration_ms", LongType()),
        StructField("track_count", IntegerType()),
        StructField("codecs", StringType()),  # comma-joined stsd entry ids
        StructField("header_ok", StringType()),
    ]
)


def _walk_boxes(b: bytes, start: int, end: int):
    """ISO-BMFF box list at [start, end): yields (type, payload_start,
    payload_end). Handles 64-bit largesize (size==1) and to-end (size==0)
    boxes; stops on any malformed size."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr:
            return
        yield typ, i + hdr, min(i + size, end)
        i += size


def _stsd_codec_ids(b: bytes, trak_start: int, trak_end: int) -> list[str]:
    """Codec sample-entry ids of one 'trak': descend the fixed
    trak -> mdia -> minf -> stbl chain to 'stsd', whose payload is
    version+flags(4) + entry_count(4) followed by sample-entry BOXES whose
    4-char type IS the codec id ('avc1', 'hev1', 'mp4a', ...)."""
    span = (trak_start, trak_end)
    for child in (b"mdia", b"minf", b"stbl"):
        found = None
        for typ, ps, pe in _walk_boxes(b, *span):
            if typ == child:
                found = (ps, pe)
                break
        if found is None:
            return []
        span = found
    for typ, ps, pe in _walk_boxes(b, *span):
        if typ == b"stsd" and pe - ps >= 8:
            return [
                etyp.decode("ascii", "replace").strip()
                for etyp, _, _ in _walk_boxes(b, ps + 8, pe)
            ]
    return []


def sniff_mp4_boxes(
    b: bytes | None,
) -> tuple[str | None, str | None, int | None, int | None, str | None, str]:
    """Parse (mime, major_brand, duration_ms, track_count, codecs, status)
    from ISO-BMFF (MP4/MOV) bytes: top-level box walk to 'ftyp' (major
    brand) and 'moov', then into 'mvhd' (timescale + duration, version 0/1
    layouts) and each 'trak' child's stbl/stsd sample-entry codec ids.
    Pure byte layout, no codec library — the same class as the
    PNG/JPEG/GIF and RIFF/WAVE parsing."""
    b = b or b""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None, None, None, None, None, "unknown"
    brand = None
    duration_ms = None
    tracks = None
    codecs: list[str] = []
    for typ, ps, pe in _walk_boxes(b, 0, len(b)):
        if typ == b"ftyp" and pe - ps >= 4:
            brand = b[ps : ps + 4].decode("ascii", "replace").strip()
        elif typ == b"moov":
            tracks = 0
            for ityp, ips, ipe in _walk_boxes(b, ps, pe):
                if ityp == b"trak":
                    tracks += 1
                    codecs.extend(_stsd_codec_ids(b, ips, ipe))
                elif ityp == b"mvhd" and ipe - ips >= 4:
                    version = b[ips]
                    if version == 1 and ipe - ips >= 32:
                        scale = int.from_bytes(b[ips + 20 : ips + 24], "big")
                        dur = int.from_bytes(b[ips + 24 : ips + 32], "big")
                    elif version == 0 and ipe - ips >= 24:
                        scale = int.from_bytes(b[ips + 12 : ips + 16], "big")
                        dur = int.from_bytes(b[ips + 16 : ips + 20], "big")
                    else:
                        continue
                    if scale:
                        duration_ms = (dur * 1000) // scale
    if duration_ms is None and tracks is None:
        return "video/mp4", brand, None, None, None, "truncated"
    return (
        "video/mp4", brand, duration_ms, tracks,
        ",".join(codecs) if codecs else None, "ok",
    )


def sniff_video_headers(media: DataFrame) -> DataFrame:
    """video rows -> parsed MP4/ISO-BMFF container metadata via
    mapInPandas (real byte-layout parsing; frame decode stays stubbed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(sniff_mp4_boxes)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_detected": parsed.map(lambda t: t[0]),
                    "major_brand": parsed.map(lambda t: t[1]),
                    "duration_ms": parsed.map(lambda t: t[2]).astype("Int64"),
                    "track_count": parsed.map(lambda t: t[3]).astype("Int32"),
                    "codecs": parsed.map(lambda t: t[4]),
                    "header_ok": parsed.map(lambda t: t[5]),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        fn, VIDEO_HEADER_SCHEMA
    )

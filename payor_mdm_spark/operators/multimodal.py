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
            for _, row in pdf.iterrows():
                dur = (row["meta"] or {}).get("duration_ms") or 0
                payload = row["payload"] or b""
                n = max(1, int(dur // every_ms))
                for i in range(n):
                    out["media_id"].append(row["media_id"])
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

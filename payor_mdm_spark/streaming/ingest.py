"""Streaming ingest of transcript turns.

The reference is a batch-rebuild pipeline with no streaming operators
(SURVEY §2.8) — incrementality in this engine comes from snapshot
checkpoints. This module adds the missing front door: a Structured
Streaming path that lands turn events into the raw table continuously and
marks conversations ready for (micro-batch) staging.

Design at scale:
* ``read_turn_stream`` — file/Iceberg streaming source with the explicit
  turn schema (no inference);
* ``closed_conversations_stream`` — watermarked session-style aggregation:
  a conversation is 'closed' when no new turn arrives within the gap, at
  which point exactly one row (conv_id, n_turns, last_ts) is emitted in
  append mode — the trigger signal for incremental staging;
* ``ingest_to_raw`` — exactly-once append into the raw landing table via
  ``writeStream`` + checkpointLocation; the batch DAG resumes from the
  landing snapshot (plans/pipeline.py), so streaming and batch share one
  storage contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType, TimestampType,
)

TURN_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def read_turn_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return (
        spark.readStream.format(fmt)
        .schema(TURN_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(path)
    )


def closed_conversations_stream(
    turns: DataFrame, watermark: str = "10 minutes", gap: str = "5 minutes"
) -> DataFrame:
    """Watermarked session windows per conv_id: one append-mode row per
    closed conversation."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("ts").alias("last_ts"),
        )
        .select("conv_id", "n_turns", "last_ts")
    )


def ingest_to_raw(
    turns: DataFrame, out_path: str, checkpoint_path: str, fmt: str = "parquet"
):
    """Exactly-once append of the turn stream into the raw landing table;
    returns the StreamingQuery."""
    return (
        turns.writeStream.format(fmt)
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )

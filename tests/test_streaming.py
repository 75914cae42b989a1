"""Structured Streaming ingest: file-source stream lands turns exactly-once
and feeds the batch rollup."""

import os
import time

from payor_mdm_spark.streaming.ingest import (
    TURN_SCHEMA,
    ingest_to_raw,
    read_turn_stream,
)


def test_stream_ingest_lands_all_turns(spark, world, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "raw")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # stage the generated turns as the streaming source
    batch = spark.read.parquet(world["turns_path"])
    batch.write.mode("overwrite").parquet(src)
    n_expected = batch.count()

    stream = read_turn_stream(spark, src)
    assert stream.isStreaming
    assert stream.schema == TURN_SCHEMA

    q = ingest_to_raw(stream, out, ckpt)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            landed = spark.read.parquet(out).count()
            if landed >= n_expected:
                break
    finally:
        q.stop()

    landed_df = spark.read.parquet(out)
    assert landed_df.count() == n_expected
    # landed rows feed the batch rollup unchanged
    from payor_mdm_spark.operators.rollup import rollup_conversations

    rolled = rollup_conversations(landed_df)
    assert rolled.count() == batch.select("conv_id").distinct().count()


def test_closed_conversations_stream_plan(spark, world, tmp_path):
    """The watermark + session-window aggregation compiles and runs on a
    file stream (append mode)."""
    from payor_mdm_spark.streaming.ingest import closed_conversations_stream

    src = str(tmp_path / "src2")
    spark.read.parquet(world["turns_path"]).write.mode("overwrite").parquet(src)
    stream = read_turn_stream(spark, src)
    closed = closed_conversations_stream(stream, watermark="1 minute", gap="1 minute")
    q = (
        closed.writeStream.format("memory")
        .queryName("closed_convs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append-mode rows only emit once the watermark passes; the plan
        # running without AnalysisException is the contract here
        spark.sql("select * from closed_convs").collect()
    finally:
        q.stop()

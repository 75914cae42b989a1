"""Custom stateful streaming operator: incremental conversation assembly.

``applyInPandasWithState`` keeps per-conv_id state (accumulated turns +
last-seen event time) across micro-batches and emits one canonical record
when a conversation goes quiet for ``gap_seconds`` — the streaming
equivalent of the batch rollup (operators/rollup.py), with identical
output semantics: turns sorted by turn_idx, per-turn text preserved.

This is the engine's example of a stateful operator Spark lacks natively
(the batch reference has none — SURVEY §2.8 notes no streaming operators
exist there; this extends the engine for the continuous-ingest deployment
shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

ASSEMBLED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("opener_text", StringType()),
        StructField("texts", ArrayType(StringType())),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("turn_idx", ArrayType(IntegerType())),
        StructField("texts", ArrayType(StringType())),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def assemble_conversations_stream(
    turns: DataFrame, gap_seconds: int = 300, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming turns -> one assembled record per closed conversation."""

    def assemble(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            idxs, texts, first_us, last_us = state.get
            order = sorted(range(len(idxs)), key=lambda i: idxs[i])
            texts_sorted = [texts[i] for i in order]
            opener = texts_sorted[0] if texts_sorted else None
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [len(texts_sorted)],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "opener_text": [opener],
                    "texts": [texts_sorted],
                }
            )
            return

        idxs: list[int] = []
        texts: list[str] = []
        first_us = last_us = None
        if state.exists:
            idxs, texts, first_us, last_us = state.get
            idxs, texts = list(idxs), list(texts)
        for pdf in batches:
            if pdf.empty:
                continue
            # vectorized batch fold — no per-row Python (input_hint)
            idxs.extend(int(v) for v in pdf["turn_idx"].to_numpy())
            texts.extend(pdf["text"].tolist())
            us_vals = pdf["ts"].astype("datetime64[us]").astype("int64")
            lo, hi = int(us_vals.min()), int(us_vals.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((idxs, texts, first_us, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        return
        yield  # pragma: no cover — make this a generator

    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

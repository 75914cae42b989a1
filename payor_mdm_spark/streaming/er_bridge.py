"""Streaming -> incremental-ER bridge.

Connects the Structured Streaming front door (streaming/ingest.py) to the
incremental batch DAG (plans/pipeline.run_incremental): each micro-batch of
transcript turns lands append-only into the ``turns_raw`` table, the FULL
turn set of every affected conversation is re-assembled from the landing
table (run_incremental's CDC contract — conversations may span
micro-batches), and the delta flows through the incremental pipeline. The
first batch bootstraps with a full run.

Exactly-once notes: foreachBatch is at-least-once on retry; the bridge is
replay-safe because (a) turn events are immutable, so duplicate landings
are identical rows and the delta dedupes on (conv_id, turn_idx), and
(b) run_incremental itself is idempotent (checkpointed stage overwrites,
deterministic ids/scores).

At scale the landing append is one Iceberg ``append()`` snapshot per
micro-batch (O(batch) write) and the per-batch ER cost is the delta
neighborhood, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from payor_mdm_spark.sources.catalog import CheckpointStore

_TURN_PK = ["conv_id", "turn_idx"]


def process_turn_batch(
    spark: SparkSession,
    store: CheckpointStore,
    batch_df: DataFrame,
    landing_table: str = "turns_raw",
    **pipeline_kwargs,
) -> None:
    """Land one micro-batch and run the (incremental) ER DAG over it."""
    from payor_mdm_spark.plans.pipeline import run_incremental, run_pipeline

    if batch_df.isEmpty():
        return
    store.append(landing_table, batch_df)
    if store.exists("scored_pairs"):
        affected = batch_df.select("conv_id").distinct()
        delta = (
            store.read(landing_table)
            .join(affected, "conv_id", "semi")
            .dropDuplicates(_TURN_PK)
        )
        run_incremental(spark, delta, store, **pipeline_kwargs)
    else:
        full = store.read(landing_table).dropDuplicates(_TURN_PK)
        run_pipeline(spark, full, store, **pipeline_kwargs)


def incremental_er_stream(
    spark: SparkSession,
    turn_stream: DataFrame,
    store: CheckpointStore,
    checkpoint_dir: str,
    available_now: bool = True,
    **pipeline_kwargs,
):
    """writeStream handle: turns stream -> foreachBatch incremental ER.

    Returns the DataStreamWriter (caller invokes .start() and awaits) so
    tests and jobs control the trigger lifecycle.
    """

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        process_turn_batch(spark, store, batch_df, **pipeline_kwargs)

    writer = (
        turn_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer

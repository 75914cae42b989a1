"""Streaming -> incremental training-corpus bridge.

The docs twin of streaming/er_bridge.py: each micro-batch of documents
lands append-only into ``docs_raw``, and the not-yet-processed delta flows
through plans/docs_pipeline.run_docs_incremental (first batch bootstraps
with a full run_docs_pipeline).

Replay safety: foreachBatch is at-least-once on retry — the bridge
anti-joins the landing table against the committed ``doc_stats`` ledger
(every analyzed doc_id lands there, kept or not), so a replayed batch
reduces to an empty delta and the run is a no-op. Documents are immutable
rows keyed by doc_id; duplicate landings dedupe on that key.

At scale the landing append is one Iceberg ``append()`` snapshot per
micro-batch and the per-batch corpus cost is the delta neighborhood
(signatures from the committed table, old x old buckets never expanded),
not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from payor_mdm_spark.sources.catalog import CheckpointStore

DOC_SCHEMA = "doc_id long, source string, text string"


def read_docs_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source document stream with the explicit corpus schema."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(path)


def process_docs_batch(
    spark: SparkSession,
    store: CheckpointStore,
    batch_df: DataFrame,
    landing_table: str = "docs_raw",
    **pipeline_kwargs,
) -> None:
    """Land one micro-batch and run the (incremental) corpus DAG over it."""
    from payor_mdm_spark.plans.docs_pipeline import (
        run_docs_incremental, run_docs_pipeline,
    )

    if batch_df.isEmpty():
        return
    store.append(landing_table, batch_df)
    # gate on the LAST stage the batch pipeline commits: a bootstrap that
    # crashed mid-way (e.g. after doc_keepers but before doc_packed) must
    # re-run the full bootstrap on retry, not wedge the incremental path
    # on a missing downstream table
    if store.exists("doc_packed"):
        seen = store.read("doc_stats").select("doc_id")
        delta = (
            store.read(landing_table)
            .dropDuplicates(["doc_id"])
            .join(seen, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if delta.isEmpty():
            return  # pure replay — already committed
        run_docs_incremental(spark, delta, store, **pipeline_kwargs)
    else:
        full = store.read(landing_table).dropDuplicates(["doc_id"])
        run_docs_pipeline(
            spark, full, store, collect_metrics=False, **pipeline_kwargs
        )


def incremental_docs_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    store: CheckpointStore,
    checkpoint_dir: str,
    available_now: bool = True,
    **pipeline_kwargs,
):
    """writeStream handle: docs stream -> foreachBatch incremental corpus
    DAG. Returns the DataStreamWriter (caller invokes .start())."""

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        process_docs_batch(spark, store, batch_df, **pipeline_kwargs)

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer

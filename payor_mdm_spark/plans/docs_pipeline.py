"""Training-corpus pipeline: the engine's second flagship DAG.

Chains the training-data operator suite into one checkpointed, resumable
pipeline over a document corpus (doc_id, source, text):

  doc_stats      quality/repetition/language/token signals (all native)
  doc_filtered   quality + repetition gates, PII scrub
  doc_exact      exact dedup (md5 groupBy, min-id keeper)
  doc_keepers    MinHash-LSH near-dup pairs -> transitive clusters ->
                 canonical keepers only
  doc_splits     deterministic content-hash train/val/test assignment
  doc_packed     GPT-style concat-and-chunk sequence packing (train split)

Same storage contract as the ER DAG (sources/catalog.CheckpointStore):
every stage commits a table, a killed run resumes from the last committed
stage, per-stage lineage comes from commit stats. Deterministic end to end
(content hashes everywhere, no RNG), so replays and resumes are
bit-identical — pinned by tests/test_docs_pipeline.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payor_mdm_spark.sources.catalog import CheckpointStore

DOC_STAGES = (
    "doc_stats", "doc_filtered", "doc_exact", "doc_keepers", "doc_splits",
    "doc_packed",
)


@dataclass
class DocsRunResult:
    tables: dict[str, DataFrame]
    metrics: list[dict] = field(default_factory=list)


def run_docs_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    store: CheckpointStore,
    quality_threshold: float = 0.3,
    max_dup_ngram_ratio: float = 0.9,
    jaccard_threshold: float = 0.8,
    budget_tokens: int = 2048,
    resume: bool = False,
    collect_metrics: bool = True,
    run_ts: str = "2026-01-01 00:00:00",
) -> DocsRunResult:
    from payor_mdm_spark.operators.dedup import (
        dedup_clusters, exact_dedup, minhash_dedup_pairs,
    )
    from payor_mdm_spark.operators.text_analysis import (
        analyze_documents, pack_sequences, redact_pii_col, repetition_signals,
        split_assignment_col,
    )

    result = DocsRunResult(tables={})

    def stage(name: str, build):
        t0 = time.time()
        if resume and store.exists(name):
            df = store.read(name)
            skipped = True
        else:
            df = build()
            store.write(name, df)
            df = store.read(name)
            skipped = False
        result.tables[name] = df
        if collect_metrics:
            parts = store.commit_stats(name)
            result.metrics.append(
                {
                    "stage": name,
                    "rows": sum(n for _, n in parts),
                    "seconds": round(time.time() - t0, 3),
                    "skipped": skipped,
                    "run_ts": run_ts,
                }
            )
        return df

    stats = stage(
        "doc_stats",
        lambda: analyze_documents(docs).join(
            repetition_signals(docs), "doc_id"
        ),
    )
    filtered = stage(
        "doc_filtered",
        lambda: stats.filter(
            (F.col("quality_score") >= quality_threshold)
            & (F.col("dup_ngram_ratio") <= max_dup_ngram_ratio)
        ).withColumn("text", redact_pii_col(F.col("text"))),
    )
    exact = stage("doc_exact", lambda: exact_dedup(filtered))

    def _keepers():
        pairs = minhash_dedup_pairs(
            exact, jaccard_threshold=jaccard_threshold
        )
        clustered = dedup_clusters(exact.select("doc_id"), pairs)
        return exact.join(
            clustered.filter("is_keeper").select("doc_id"), "doc_id", "semi"
        )

    keepers = stage("doc_keepers", _keepers)
    splits = stage(
        "doc_splits",
        lambda: keepers.withColumn(
            "split", split_assignment_col(F.col("doc_id"))
        ),
    )
    stage(
        "doc_packed",
        lambda: pack_sequences(
            splits.filter(F.col("split") == "train"), budget_tokens
        ),
    )

    if collect_metrics:
        metrics_df = spark.createDataFrame(
            [
                (m["stage"], m["rows"], m["seconds"], m["skipped"], m["run_ts"])
                for m in result.metrics
            ],
            "stage string, rows long, seconds double, skipped boolean, run_ts string",
        )
        store.write("docs_run_metrics", metrics_df)
    return result

"""spark-submit entry point for the training-corpus pipeline.

Usage (cluster):
    spark-submit --py-files dist/payor_mdm_spark.zip \
        jobs/run_docs_pipeline.py \
        --input <documents parquet path> --output <checkpoint root> \
        [--resume] [--incremental] [--quality-threshold 0.3]
        [--budget-tokens 2048]

    --incremental treats --input as a DELTA batch (doc_ids greater than
    every committed id) and runs run_docs_incremental against the
    committed state in --output.

Local smoke:
    PYTHONPATH=. python jobs/run_docs_pipeline.py \
        --input /root/testdata/sf0.01/documents.parquet --output /tmp/docs_run
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="checkpoint root")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--incremental", action="store_true",
                   help="treat --input as a delta batch against --output")
    p.add_argument("--iceberg", action="store_true")
    p.add_argument("--quality-threshold", type=float, default=0.3)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--budget-tokens", type=int, default=2048)
    args = p.parse_args(argv)

    from payor_mdm_spark.plans.docs_pipeline import (
        run_docs_incremental, run_docs_pipeline,
    )
    from payor_mdm_spark.session import get_spark
    from payor_mdm_spark.sources.catalog import CheckpointStore

    spark = get_spark(app_name="payor-mdm-docs-pipeline")
    docs = spark.read.parquet(args.input).select("doc_id", "source", "text")
    store = CheckpointStore(
        spark, args.output,
        mode="iceberg" if args.iceberg else "parquet",
        iceberg_namespace=args.output if args.iceberg else None,
    )
    if args.incremental:
        result = run_docs_incremental(
            spark, docs, store,
            quality_threshold=args.quality_threshold,
            jaccard_threshold=args.jaccard_threshold,
            budget_tokens=args.budget_tokens,
        )
        for name, df in result.tables.items():
            print(f"{name:>14} rows={df.count():>9}")
        return 0
    result = run_docs_pipeline(
        spark, docs, store,
        quality_threshold=args.quality_threshold,
        jaccard_threshold=args.jaccard_threshold,
        budget_tokens=args.budget_tokens,
        resume=args.resume,
    )
    for m in result.metrics:
        print(f"{m['stage']:>14} rows={m['rows']:>9} {m['seconds']:8.2f}s"
              f"{'  (resumed)' if m['skipped'] else ''}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""spark-submit entry point for the MDM pipeline.

Usage (cluster):
    python tools/package.py                       # builds dist/payor_mdm_spark.zip
    spark-submit --py-files dist/payor_mdm_spark.zip \
        jobs/run_pipeline.py \
        --input  <turns parquet path or iceberg table> \
        --output <checkpoint root / iceberg namespace> \
        [--resume] [--iceberg] [--run-ts "2026-01-01 00:00:00"]

Local smoke:
    PYTHONPATH=. python jobs/run_pipeline.py --generate 65 --output /tmp/mdm_run
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="turns parquet path or iceberg table name")
    p.add_argument("--generate", type=int, default=0,
                   help="generate a synthetic world of N entities instead of --input")
    p.add_argument("--output", required=True, help="checkpoint root (or iceberg namespace)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--incremental", action="store_true",
                   help="treat --input as a conversation-granularity delta "
                        "against an existing checkpoint root (full turn set "
                        "of every new/changed conversation)")
    p.add_argument("--iceberg", action="store_true")
    p.add_argument("--run-ts", default="2026-01-01 00:00:00")
    p.add_argument("--validate", action="store_true",
                   help="run the dbt-test-style data contracts after the "
                        "pipeline; non-zero exit on any failure")
    p.add_argument("--max-block-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from payor_mdm_spark.plans.pipeline import run_pipeline
    from payor_mdm_spark.session import get_spark
    from payor_mdm_spark.sources.catalog import CheckpointStore
    from payor_mdm_spark.sources.steward import (
        read_hierarchy_overrides,
        read_steward_decisions,
        seed_abbreviation_dict,
        seed_survivorship_config,
    )

    spark = get_spark(app_name="payor-mdm-pipeline")
    if args.generate:
        import tempfile

        from payor_mdm_spark.datagen.transcripts import generate_world, write_world

        d = tempfile.mkdtemp(prefix="mdm_world_")
        turns_path, _ = write_world(generate_world(args.seed, args.generate), d)
        turns = spark.read.parquet(turns_path)
    elif args.input and "/" not in args.input:
        from payor_mdm_spark.sources.readers import read_turns_iceberg

        turns = read_turns_iceberg(spark, args.input)
    elif args.input:
        from payor_mdm_spark.sources.readers import read_turns_parquet

        turns = read_turns_parquet(spark, args.input)
    else:
        p.error("one of --input / --generate is required")

    store = CheckpointStore(
        spark, args.output,
        mode="iceberg" if args.iceberg else "parquet",
        iceberg_namespace=args.output if args.iceberg else None,
    )
    # config-as-data: idempotent seeds, then every steward overlay the
    # store holds is applied on this run (decisions, hierarchy edits)
    seed_survivorship_config(spark, store)
    seed_abbreviation_dict(spark, store)
    steward = read_steward_decisions(store)
    hierarchy_overrides = read_hierarchy_overrides(store)
    if args.incremental:
        from payor_mdm_spark.plans.pipeline import run_incremental

        result = run_incremental(
            spark, turns, store,
            run_ts=args.run_ts,
            steward_decisions=steward, max_block_size=args.max_block_size,
            hierarchy_overrides=hierarchy_overrides,
        )
    else:
        result = run_pipeline(
            spark, turns, store,
            run_ts=args.run_ts, resume=args.resume,
            steward_decisions=steward, max_block_size=args.max_block_size,
            hierarchy_overrides=hierarchy_overrides,
        )
    for m in result.metrics:
        print(f"{m['stage']:>18} rows={m['rows']:>10} {m['seconds']:8.2f}s"
              f"{'  (resumed)' if m['skipped'] else ''}")
    if args.validate:
        from payor_mdm_spark.plans.contracts import validate_store

        checks = validate_store(store)
        failed = [c for c in checks if not c.passed]
        for c in checks:
            mark = "PASS" if c.passed else f"FAIL ({c.failing_rows} rows)"
            print(f"contract {c.table:>16} :: {c.check:<36} {mark}")
        if failed:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Driver contract for the spark-graft builder (PySpark target).

``entry``     — the flagship query: the full entity-resolution pipeline
                (rollup -> staging -> blocking -> ensemble scoring ->
                clustering -> survivorship) over a deterministic synthetic
                transcript world (BASELINE.json input_hint shape), returning
                the golden-entity DataFrame.
``queries``   — one entry per implemented operator family from SURVEY §2
                (+ the training-data suite), runnable over the driver's
                testdata tables.
``oracle_sql``— DuckDB-executable twins for EVERY query (60/60): hash
                kernels run md5-derived modes in their query entries so
                the twins reproduce them exactly (MinHash-LSH stage-by-
                stage, SimHash votes, fingerprints, LSH hyperplane
                literals, IVF's hash-sampled quantizer); the xxhash64
                fast paths stay in the blocking layer, pinned by pytest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: resolve a deterministic transcript world into golden
    entities (driver checks rows > 0, stable schema)."""
    from payor_mdm_spark.datagen.transcripts import generate_world, world_to_tables
    from payor_mdm_spark.operators.blocking import candidate_pairs
    from payor_mdm_spark.operators.candidates import build_candidates
    from payor_mdm_spark.operators.clustering import build_match_groups
    from payor_mdm_spark.operators.golden import golden_records
    from payor_mdm_spark.operators.rollup import rollup_conversations
    from payor_mdm_spark.operators.scoring import score_pairs
    from payor_mdm_spark.operators.staging import stage_records
    from payor_mdm_spark.operators.survivorship import survive_groups

    world = generate_world(seed=42, n_entities=65)
    turns_tbl, _ = world_to_tables(world)
    turns = spark.createDataFrame(turns_tbl.to_pandas())

    staged = stage_records(spark, rollup_conversations(turns))
    staged.cache()
    pairs = candidate_pairs(staged)
    scored = score_pairs(pairs, staged)
    candidates = build_candidates(scored, run_ts="2026-01-01 00:00:00")
    groups = build_match_groups(candidates, staged)
    survived = survive_groups(groups, staged)
    return golden_records(survived, run_ts="2026-01-01 00:00:00")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from payor_mdm_spark.plans.testdata_queries import Q

    return dict(Q)


def oracle_sql() -> dict[str, str]:
    from payor_mdm_spark.plans.testdata_queries import ORACLE

    return dict(ORACLE)

"""Schema'd source readers (SURVEY §2.1 S1/S2).

All schemas are explicit — the reference dual-declares schemas in DDL and
dbt contracts and never infers (SURVEY §1.3); `inferSchema` is banned here
for the same reason (a sampling scan at 100 TB is also a full extra read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from payor_mdm_spark.streaming.ingest import TURN_SCHEMA


def read_turns_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TURN_SCHEMA).parquet(path)


def read_turns_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV landing fixture path (generator/generate_payors.py:300-317
    analog): header on, explicit schema, strict mode."""
    return (
        spark.read.schema(TURN_SCHEMA)
        .option("header", True)
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
        .csv(path)
    )


def read_turns_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Production source: Iceberg table of turns (BASELINE.json input_hint).
    Partition layout at scale: bucket(conv_id) so the rollup groupBy is a
    shuffle-free partial aggregation."""
    return spark.read.table(table)

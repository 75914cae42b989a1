"""Golden records + xref assembly.

Mirrors /root/reference/transform/payor_mdm/models/master/golden_payors.sql
and xref.sql. Quality metrics: completeness = non-null count over the 15
canonical fields / 15.0 rounded to 4 (golden_payors.sql:44-70); source_count
and confidence_score arrive pre-computed from the single survivorship
aggregation (operators/survivorship.py) instead of three extra self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from payor_mdm_spark.config import COMPLETENESS_FIELDS


def completeness_col() -> F.Column:
    total = None
    for c in COMPLETENESS_FIELDS:
        term = F.when(F.col(c).isNotNull(), 1).otherwise(0)
        total = term if total is None else total + term
    return F.round(
        total.cast("double") / F.lit(float(len(COMPLETENESS_FIELDS))), 4
    )


def golden_records(survived: DataFrame, run_ts: str | None = None) -> DataFrame:
    df = survived.withColumn("completeness_score", completeness_col())
    df = df.withColumnRenamed("match_group_id", "master_entity_id")
    if run_ts is not None:
        ts = F.lit(run_ts).cast("timestamp")
        df = df.withColumn("created_at", ts).withColumn("updated_at", ts)
    return df.select(
        "master_entity_id",
        "name_raw", "name_alt", "exact_key_1", "npi", "exact_key_2",
        "addr_line_1", "addr_line_2", "city", "state_code", "zip_code",
        "phone", "website", "entity_type", "line_of_business",
        "is_active", "effective_date", "termination_date",
        "completeness_score", "source_count", "confidence_score",
        "record_count",
        *(["created_at", "updated_at"] if run_ts is not None else []),
    )


def build_xref(match_groups: DataFrame, staged: DataFrame) -> DataFrame:
    """Every source record -> its master entity (xref.sql:16-25)."""
    return (
        match_groups.select(
            "source_record_id",
            F.col("match_group_id").alias("master_entity_id"),
            F.col("group_confidence").alias("match_confidence"),
        )
        .join(staged.select("source_record_id", "source_system", "source_id"),
              "source_record_id")
        .select(
            "source_record_id", "master_entity_id", "source_system",
            "source_id", "match_confidence",
        )
    )

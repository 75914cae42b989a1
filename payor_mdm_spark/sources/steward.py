"""Steward write-back + survivorship-config seeding + audit + telemetry.

The serving-side tables of the reference (SURVEY §2.1 S7/S8, §3.3):

* survivorship config — rules-as-data, seeded idempotently via MERGE keyed
  on field_name (07_seed_survivorship_config.sql:12,84-100). On Iceberg
  this is a literal `MERGE INTO`; the parquet dialect implements the same
  upsert semantics with a keyed anti-join + union (never row-at-a-time).
* steward decisions — the review UI's write-back
  (app/src/pages/MatchReview.tsx:84-85): append a decision row + an audit
  row; `final_decision` is then re-derived by re-running
  operators/candidates.build_candidates with the fresh overlay (the
  reference's `dbt run --select golden_payors+` selective rebuild).
* strategy performance — per-strategy telemetry
  (12_abbreviation_dict.sql:9-25; schema exists unfilled in the reference —
  we fill it from the scored candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payor_mdm_spark.config import SURVIVORSHIP_RULES
from payor_mdm_spark.sources.catalog import CheckpointStore

_STEWARD_ROW_SCHEMA = (
    "candidate_id string, steward_decision string, steward_user string, "
    "steward_ts_str string, steward_notes string"
)


def seed_survivorship_config(
    spark: SparkSession, store: CheckpointStore,
    overrides: dict[str, str] | None = None,
    table: str = "survivorship_config",
) -> DataFrame:
    """Idempotent MERGE-style upsert keyed on field_name."""
    rules = dict(SURVIVORSHIP_RULES)
    rules.update(overrides or {})
    incoming = spark.createDataFrame(
        [(k, v) for k, v in rules.items()], "field_name string, rule string"
    )
    if store.mode == "iceberg" and store.exists(table):
        incoming.createOrReplaceTempView("_surv_incoming")
        store.spark.sql(
            f"""
            MERGE INTO {store._table(table)} t
            USING _surv_incoming s ON t.field_name = s.field_name
            WHEN MATCHED THEN UPDATE SET t.rule = s.rule
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        return store.read(table)
    if store.exists(table):
        existing = store.read(table)
        kept = existing.join(incoming, "field_name", "left_anti")
        merged = kept.unionByName(incoming)
    else:
        merged = incoming
    store.write(table, merged)
    return store.read(table)


def record_steward_decision(
    spark: SparkSession,
    store: CheckpointStore,
    candidate_id: str,
    decision: str,
    user: str,
    notes: str | None = None,
    decided_at: str = "2026-01-01 00:00:00",
    table: str = "steward_decisions",
    audit_table: str = "mdm_change_log",
) -> None:
    """Append one steward decision + one audit row (MatchReview.tsx:84-85).

    Latest decision per candidate wins on read (read_steward_decisions).
    """
    if decision not in ("confirmed_match", "confirmed_no_match"):
        raise ValueError(f"invalid steward decision: {decision}")
    row = (
        spark.createDataFrame(
            [(candidate_id, decision, user, decided_at, notes)], _STEWARD_ROW_SCHEMA
        )
        .withColumn("steward_timestamp", F.col("steward_ts_str").cast("timestamp"))
        .drop("steward_ts_str")
        .select("candidate_id", "steward_decision", "steward_user",
                "steward_timestamp", "steward_notes")
    )
    existing = store.read(table) if store.exists(table) else None
    store.write(table, existing.unionByName(row) if existing is not None else row)

    audit = spark.createDataFrame(
        [(candidate_id, "steward_decision", None, decision, user, decided_at)],
        "entity_key string, field_name string, old_value string, "
        "new_value string, changed_by string, changed_at string",
    ).withColumn("changed_at", F.col("changed_at").cast("timestamp"))
    prev = store.read(audit_table) if store.exists(audit_table) else None
    store.write(audit_table, prev.unionByName(audit) if prev is not None else audit)


def read_steward_decisions(store: CheckpointStore,
                           table: str = "steward_decisions") -> DataFrame | None:
    """Latest decision per candidate_id (append-only table, last write wins
    by steward_timestamp then insertion order)."""
    if not store.exists(table):
        return None
    from pyspark.sql.window import Window

    df = store.read(table)
    w = Window.partitionBy("candidate_id").orderBy(
        F.col("steward_timestamp").desc_nulls_last()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def strategy_performance(candidates: DataFrame) -> DataFrame:
    """Per-strategy telemetry (STRATEGY_PERFORMANCE analog,
    12_abbreviation_dict.sql:9-25): usage counts, win counts per field,
    score distribution, decision mix."""
    used = candidates.select(
        F.explode("strategies_used").alias("strategy"),
        "overall_score", "auto_decision",
    )
    return used.groupBy("strategy").agg(
        F.count(F.lit(1)).alias("times_used"),
        F.round(F.avg("overall_score"), 4).alias("avg_overall_score"),
        F.sum(F.when(F.col("auto_decision") == "auto_match", 1).otherwise(0)).alias("auto_match_count"),
        F.sum(F.when(F.col("auto_decision") == "review", 1).otherwise(0)).alias("review_count"),
        F.sum(F.when(F.col("auto_decision") == "auto_no_match", 1).otherwise(0)).alias("auto_no_match_count"),
    )


_HIERARCHY_ROW_SCHEMA = (
    "parent_master_id string, child_master_id string, action string, "
    "relationship_type string, steward_user string, steward_ts_str string"
)


def record_hierarchy_decision(
    spark: SparkSession,
    store: CheckpointStore,
    parent_master_id: str,
    child_master_id: str,
    action: str,
    user: str,
    relationship_type: str = "parent_company",
    decided_at: str = "2026-01-01 00:00:00",
    table: str = "hierarchy_overrides",
    audit_table: str = "mdm_change_log",
) -> None:
    """Append one steward hierarchy decision + one audit row.

    The Spark analog of HierarchyManager.tsx:112's INSERT (manual edge,
    action='insert') and of confirming a tentative inferred edge
    (05_create_master_tables.sql:88 steward_confirmed, action='confirm').
    Applied to the inferred hierarchy by
    operators.hierarchy.apply_hierarchy_overrides, so decisions survive
    pipeline re-runs.
    """
    if action not in ("confirm", "insert"):
        raise ValueError(f"invalid hierarchy action: {action}")
    if parent_master_id == child_master_id:
        raise ValueError("parent and child must differ")
    row = (
        spark.createDataFrame(
            [(parent_master_id, child_master_id, action, relationship_type,
              user, decided_at)],
            _HIERARCHY_ROW_SCHEMA,
        )
        .withColumn("steward_timestamp", F.col("steward_ts_str").cast("timestamp"))
        .drop("steward_ts_str")
    )
    existing = store.read(table) if store.exists(table) else None
    store.write(table, existing.unionByName(row) if existing is not None else row)

    audit = spark.createDataFrame(
        [(f"{parent_master_id}->{child_master_id}", "hierarchy_decision",
          None, action, user, decided_at)],
        "entity_key string, field_name string, old_value string, "
        "new_value string, changed_by string, changed_at string",
    ).withColumn("changed_at", F.col("changed_at").cast("timestamp"))
    prev = store.read(audit_table) if store.exists(audit_table) else None
    store.write(audit_table, prev.unionByName(audit) if prev is not None else audit)


def read_hierarchy_overrides(
    store: CheckpointStore, table: str = "hierarchy_overrides"
) -> DataFrame | None:
    """Latest decision per (parent, child) edge (append-only, last wins)."""
    if not store.exists(table):
        return None
    from pyspark.sql.window import Window

    df = store.read(table)
    w = Window.partitionBy("parent_master_id", "child_master_id").orderBy(
        F.col("steward_timestamp").desc_nulls_last()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def seed_abbreviation_dict(
    spark: SparkSession, store: CheckpointStore,
    overrides: dict[str, str] | None = None,
    table: str = "abbreviation_dict",
) -> DataFrame:
    """Idempotent MERGE-style upsert of the abbreviation dictionary keyed
    on abbreviation (ABBREVIATION_DICT analog, 12_abbreviation_dict.sql:
    49-75). Config-as-data parity with SURVIVORSHIP_CONFIG: stewards add
    rows here and the ensemble router picks them up without a code change.
    """
    from payor_mdm_spark.config import ABBREVS

    rows = dict(ABBREVS)
    rows.update(overrides or {})
    incoming = spark.createDataFrame(
        [(k, v) for k, v in rows.items()],
        "abbreviation string, expansion string",
    )
    if store.mode == "iceberg" and store.exists(table):
        incoming.createOrReplaceTempView("_abbr_incoming")
        store.spark.sql(
            f"""
            MERGE INTO {store._table(table)} t
            USING _abbr_incoming s ON t.abbreviation = s.abbreviation
            WHEN MATCHED THEN UPDATE SET t.expansion = s.expansion
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        return store.read(table)
    if store.exists(table):
        existing = store.read(table)
        kept = existing.join(incoming, "abbreviation", "left_anti")
        merged = kept.unionByName(incoming)
    else:
        merged = incoming
    store.write(table, merged)
    return store.read(table)


def load_abbreviation_dict(
    store: CheckpointStore, table: str = "abbreviation_dict"
) -> dict[str, str] | None:
    """The seeded dict as a plain mapping for the router closure (a
    broadcast-sized table: tens of rows). None if never seeded."""
    if not store.exists(table):
        return None
    return {
        r["abbreviation"]: r["expansion"] for r in store.read(table).collect()
    }

"""Survivorship: one survived record per match group — in ONE aggregation.

The reference computes six rule families as five window-QUALIFY passes plus
a 6-way left join (/root/reference/transform/payor_mdm/models/master/
int_survivorship.sql:22-176). On Spark that would be 6 shuffles + 5 joins on
the same key; we collapse all rule families into a single
groupBy(match_group_id) (SURVEY §4) using an order-respecting struct-min
trick for the FIRST_VALUE-IGNORE-NULLS rules:

    first non-null value of `col` ordered by priority  ==
    min(struct(priority, tiebreak, col)) over rows where col IS NOT NULL

Rule families (int_survivorship.sql + 07_seed_survivorship_config.sql):
  * source_priority  — lowest source_trust_rank wins (:26-49)
  * cms_reference_first — cms_reference source outranks all (:57-72)
  * most_recent      — latest loaded_at wins, nulls last (:76-106)
  * most_complete    — longest non-blank string (:111-120)
  * any_true         — BOOL_OR (:124-132)
  * min / max dates  — (:136-145)

Determinism: the reference's window ties are engine-order-dependent; we add
source_record_id as the final tiebreak everywhere so results are stable
across partitionings and cluster sizes (required for golden fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SOURCE_PRIORITY_FIELDS = (
    "name_raw", "exact_key_1", "npi", "website", "entity_type",
    "line_of_business",
)
MOST_RECENT_FIELDS = (
    "addr_line_1", "addr_line_2", "city", "state_code", "zip_code", "phone",
)

_FAR_FUTURE_US = 2**62  # sort key for NULL loaded_at (nulls last under DESC)


def _first_nonnull_by(col: str, priority: Column, tiebreak: Column) -> Column:
    """min(struct(priority, tiebreak, col)) over non-null col -> col."""
    packed = F.when(
        F.col(col).isNotNull(),
        F.struct(priority.alias("p"), tiebreak.alias("t"), F.col(col).alias("v")),
    )
    return F.min(packed)["v"].alias(col)


def survive_groups(match_groups: DataFrame, staged: DataFrame) -> DataFrame:
    """match_groups x staged -> one survived row per match_group_id, plus
    group-level metrics (source_count, confidence_score, record_count)."""
    members = match_groups.select(
        "match_group_id", "source_record_id", "group_confidence"
    ).join(staged, "source_record_id")

    trust = F.coalesce(F.col("source_trust_rank"), F.lit(999))
    rid = F.col("source_record_id")
    # cms_reference-first priority (int_survivorship.sql:63)
    cms_priority = F.when(
        F.col("source_system") == "cms_reference", F.lit(1)
    ).otherwise(trust + 10)
    # most_recent: DESC by loaded_at, nulls last -> ascending negated micros
    recency = F.when(
        F.col("loaded_at").isNotNull(), -F.unix_micros(F.col("loaded_at"))
    ).otherwise(F.lit(_FAR_FUTURE_US))

    aggs: list[Column] = []
    for c in SOURCE_PRIORITY_FIELDS:
        aggs.append(_first_nonnull_by(c, trust, rid))
    aggs.append(_first_nonnull_by("exact_key_2", cms_priority, rid))
    for c in MOST_RECENT_FIELDS:
        aggs.append(_first_nonnull_by(c, recency, rid))
    # most_complete: longest non-blank name_alt (ties -> larger value, then
    # larger id — max over struct)
    name_alt_packed = F.when(
        F.col("name_alt").isNotNull() & (F.trim("name_alt") != ""),
        F.struct(
            F.length("name_alt").alias("l"),
            F.col("name_alt").alias("v"),
        ),
    )
    aggs.append(F.max(name_alt_packed)["v"].alias("name_alt"))
    aggs.append(F.bool_or("is_active").alias("is_active"))
    aggs.append(F.min("effective_date").alias("effective_date"))
    aggs.append(F.max("termination_date").alias("termination_date"))
    # group metrics (golden_payors.sql:22-42)
    aggs.append(F.countDistinct("source_system").alias("source_count"))
    aggs.append(
        F.avg(F.coalesce(F.col("group_confidence"), F.lit(1.0))).alias(
            "confidence_score"
        )
    )
    aggs.append(F.count(F.lit(1)).alias("record_count"))

    return members.groupBy("match_group_id").agg(*aggs)

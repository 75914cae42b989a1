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

_FAR_FUTURE_US = 2**62  # sort key for NULL loaded_at (nulls last under DESC)


def _first_nonnull_by(col: str, priority: Column, tiebreak: Column) -> Column:
    """min(struct(priority, tiebreak, col)) over non-null col -> col."""
    packed = F.when(
        F.col(col).isNotNull(),
        F.struct(priority.alias("p"), tiebreak.alias("t"), F.col(col).alias("v")),
    )
    return F.min(packed)["v"].alias(col)


def _most_complete(col: str) -> Column:
    """Longest non-blank value (ties -> larger value — max over struct)."""
    packed = F.when(
        F.col(col).isNotNull() & (F.trim(col) != ""),
        F.struct(F.length(col).alias("l"), F.col(col).alias("v")),
    )
    return F.max(packed)["v"].alias(col)


def survive_groups(
    match_groups: DataFrame, staged: DataFrame,
    rules: dict[str, str] | None = None,
) -> DataFrame:
    """match_groups x staged -> one survived row per match_group_id, plus
    group-level metrics (source_count, confidence_score, record_count).

    ``rules`` maps field -> rule family and defaults to
    config.SURVIVORSHIP_RULES — the same map seed_survivorship_config
    persists as the SURVIVORSHIP_CONFIG table (rules-as-data,
    05_create_master_tables.sql:100-110): the pipeline reads the seeded
    table and passes it here, so stewards can flip a field's rule without
    a code change (exceeds the reference, whose int_survivorship.sql
    hard-codes the families)."""
    from payor_mdm_spark.config import SURVIVORSHIP_RULES

    rules = dict(SURVIVORSHIP_RULES) if rules is None else dict(rules)
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

    builders = {
        "source_priority": lambda c: _first_nonnull_by(c, trust, rid),
        "cms_reference_first": lambda c: _first_nonnull_by(c, cms_priority, rid),
        "most_recent": lambda c: _first_nonnull_by(c, recency, rid),
        "most_complete": _most_complete,
        "any_true": lambda c: F.bool_or(c).alias(c),
        "min": lambda c: F.min(c).alias(c),
        "max": lambda c: F.max(c).alias(c),
    }
    unknown = {r for r in rules.values() if r not in builders}
    if unknown:
        raise ValueError(f"unknown survivorship rule families: {sorted(unknown)}")
    # deterministic output column order regardless of where the rules came
    # from (dict vs collected table rows): config order first, extras sorted
    base_order = {f: i for i, f in enumerate(SURVIVORSHIP_RULES)}
    ordered = sorted(
        rules.items(), key=lambda kv: (base_order.get(kv[0], len(base_order)), kv[0])
    )
    aggs: list[Column] = [builders[rule](field) for field, rule in ordered]
    # group metrics (golden_payors.sql:22-42)
    aggs.append(F.countDistinct("source_system").alias("source_count"))
    aggs.append(
        F.avg(F.coalesce(F.col("group_confidence"), F.lit(1.0))).alias(
            "confidence_score"
        )
    )
    aggs.append(F.count(F.lit(1)).alias("record_count"))

    return members.groupBy("match_group_id").agg(*aggs)

"""Serving-layer rollups: the reference review UI's read queries.

Mirrors the raw SQL each page issues (app/src/pages/Dashboard.tsx:39-46,
DataQuality.tsx:31-47, MatchReview.tsx:42, GoldenRecords.tsx:48-71) as
DataFrame programs over the engine's tables. On a deployment these are the
queries a steward UI or BI layer runs against the golden/candidate Iceberg
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMPLETENESS_FIELDS_UI = ("name_raw", "exact_key_1", "npi", "addr_line_1", "phone")


def dashboard_counts(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Headline tiles (Dashboard.tsx:39-43): golden count, staged count,
    review queue depth, hierarchy edges."""
    return {
        "golden_entities": tables["golden"].count(),
        "staged_records": tables["staged"].count(),
        "review_queue": tables["match_candidates"]
        .filter(F.col("auto_decision") == "review")
        .count(),
        "hierarchy_edges": tables["hierarchy"].count(),
    }


def score_histogram(candidates: DataFrame, buckets: int = 10) -> DataFrame:
    """WIDTH_BUCKET(score, 0, 1, 10) histogram (Dashboard.tsx:44)."""
    return (
        candidates.groupBy(
            F.width_bucket(F.col("overall_score"), F.lit(0.0), F.lit(1.0), F.lit(buckets)).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


def records_by_source(staged: DataFrame) -> DataFrame:
    """Per-feed record counts (Dashboard.tsx:45)."""
    return staged.groupBy("source_system").agg(F.count(F.lit(1)).alias("cnt"))


def completeness_by_source(staged: DataFrame) -> DataFrame:
    """Per-source field-completeness percentages (DataQuality.tsx:31-41)."""
    aggs = [F.count(F.lit(1)).alias("total")]
    for c in COMPLETENESS_FIELDS_UI:
        aggs.append(
            (
                F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)) * 100.0
                / F.count(F.lit(1))
            ).alias(f"{c}_pct")
        )
    return staged.groupBy("source_system").agg(*aggs)


def cross_source_match_rates(candidates: DataFrame) -> DataFrame:
    """Pairs + match counts per (source_a, source_b) (DataQuality.tsx:42-47);
    source systems recovered from the '{source}:{id}' identity scheme."""
    src_a = F.split(F.col("source_record_id_a"), ":")[0]
    src_b = F.split(F.col("source_record_id_b"), ":")[0]
    return (
        candidates.groupBy(src_a.alias("source_a"), src_b.alias("source_b"))
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(F.when(F.col("final_decision") == "match", 1).otherwise(0)).alias("matches"),
        )
    )


def review_queue(candidates: DataFrame, limit: int = 50) -> DataFrame:
    """The steward queue (MatchReview.tsx:42): undecided review pairs,
    highest score first (deterministic tiebreak)."""
    return (
        candidates.filter(
            (F.col("auto_decision") == "review") & F.col("steward_decision").isNull()
        )
        .orderBy(F.col("overall_score").desc(), F.col("candidate_id"))
        .limit(limit)
    )


def golden_browse(
    golden: DataFrame,
    xref: DataFrame,
    search: str | None = None,
    limit: int = 50,
    offset: int = 0,
) -> DataFrame:
    """The golden-record browse/search page (GoldenRecords.tsx:48-71):
    every golden row + its XREF source count, optional case-insensitive
    name filter, ordered by name, paginated. The reference issues a
    correlated COUNT subquery per row; Spark-first this is a pre-aggregated
    left join (one small shuffle on master_entity_id, broadcastable).
    Deterministic pagination: master_entity_id tie-breaks equal names.
    """
    counts = xref.groupBy("master_entity_id").agg(
        F.count(F.lit(1)).alias("source_count")
    )
    base = golden.drop("source_count").join(counts, "master_entity_id", "left")
    base = base.withColumn(
        "source_count", F.coalesce(F.col("source_count"), F.lit(0))
    )
    if search:
        base = base.filter(
            F.upper(F.col("name_raw")).contains(search.upper())
        )
    return (
        base.orderBy(F.col("name_raw"), F.col("master_entity_id"))
        .offset(offset)
        .limit(limit)
    )


def golden_detail(
    golden: DataFrame,
    xref: DataFrame,
    staged: DataFrame,
    hierarchy: DataFrame,
    master_entity_id: str,
) -> dict[str, DataFrame]:
    """The browse page's expand queries (GoldenRecords.tsx:67-71): the
    golden row, its contributing source records (XREF x staged), and every
    hierarchy edge touching it. Point lookups — each plan is a pushed-down
    equality filter plus one broadcastable join."""
    mid = F.lit(master_entity_id)
    return {
        "golden": golden.filter(F.col("master_entity_id") == mid),
        "sources": (
            xref.filter(F.col("master_entity_id") == mid)
            .join(staged, "source_record_id")
        ),
        "hierarchy": hierarchy.filter(
            (F.col("parent_master_id") == mid) | (F.col("child_master_id") == mid)
        ),
    }


def explain_pair(scored: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """'Why did these match?' — one row per field with its score, weight,
    winning strategy and weighted contribution to the composite (the
    steward-review analog of the reference's ensemble_detail VARIANT,
    int_match_scored.sql:81). Native unpivot over the scored pair row."""
    from payor_mdm_spark.config import FIELD_WEIGHTS

    fields = [
        ("name", "score_name", "winning_name_strategy", FIELD_WEIGHTS["name"]),
        ("exact_key_1", "score_exact_key_1", None, FIELD_WEIGHTS["exact_key_1"]),
        ("address", "score_address", "winning_addr_strategy", FIELD_WEIGHTS["address"]),
        ("phone", "score_phone", None, FIELD_WEIGHTS["phone"]),
        ("exact_key_2", "score_exact_key_2", None, FIELD_WEIGHTS["exact_key_2"]),
    ]
    row = scored.filter(
        (F.col("source_record_id_a") == id_a)
        & (F.col("source_record_id_b") == id_b)
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("field"),
                F.col(score_col).alias("score"),
                (F.col(strat_col) if strat_col else F.lit(None).cast("string")).alias("strategy"),
                F.lit(weight).alias("weight"),
            )
            for name, score_col, strat_col, weight in fields
        ]
    )
    exploded = row.select(
        "source_record_id_a", "source_record_id_b", "match_rule",
        "overall_score", F.explode(structs).alias("_f"),
    ).select(
        "source_record_id_a", "source_record_id_b", "match_rule",
        "overall_score",
        F.col("_f.field").alias("field"),
        F.col("_f.score").alias("score"),
        F.col("_f.strategy").alias("strategy"),
        F.col("_f.weight").alias("weight"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source_record_id_a", "source_record_id_b")
    present_weight = F.sum(
        F.when(F.col("score").isNotNull(), F.col("weight")).otherwise(0.0)
    ).over(w)
    return exploded.withColumn(
        "contribution",
        F.when(
            F.col("score").isNotNull() & (present_weight > 0),
            F.round(F.col("score") * F.col("weight") / present_weight, 4),
        ),
    )


def borderline_automatch_queue(
    candidates: DataFrame,
    band: tuple[float, float] = (0.85, 0.88),
    limit: int = 100,
) -> DataFrame:
    """Audit queue for JUST-above-threshold auto-matches.

    The measured precision loss (BENCH/BASELINE.md §3) came entirely from
    FUZZY edges scoring barely above the 0.85 auto-match cut — edges the
    standard review queue never surfaces because they auto-matched. Most
    of that band is now demoted to review automatically by the borderline
    geo-contradiction gate (candidates.auto_decision_col); this queue
    remains the audit surface for the borderline automatches that PASSED
    the gate, lowest-score-first. A confirmed_no_match decision on one of
    them splits the transitive cluster on the next run.
    """
    lo, hi = band
    return (
        candidates.filter(
            (F.col("final_decision") == "match")
            & (F.col("match_rule") == "FUZZY")
            & (F.col("overall_score") >= lo)
            & (F.col("overall_score") < hi)
        )
        .orderBy(F.col("overall_score").asc(), F.col("candidate_id"))
        .limit(limit)
    )

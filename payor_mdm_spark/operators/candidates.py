"""Match candidates: thresholds + steward overlay -> final decisions.

Mirrors /root/reference/transform/payor_mdm/models/match/match_candidates.sql:
auto_decision from thresholds (auto_match >= 0.85, review >= 0.60, DET* rules
auto-match at 1.0; :33-39) and final_decision with steward precedence
(confirmed_match > confirmed_no_match > auto; :55-63).

Differences by design (SURVEY §2.7): candidate ids are deterministic
(md5(id_a || '|' || id_b)) instead of uuid_string() — nondeterministic ids
break golden fixtures and snapshot resume — and created_at is a run-level
literal passed in by the pipeline rather than per-row current_timestamp().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from payor_mdm_spark import config
from payor_mdm_spark.config import (
    AUTO_MATCH_THRESHOLD,
    BORDERLINE_GEO_CEILING,
    DET_NAME_FLOOR,
    REVIEW_THRESHOLD,
)
from payor_mdm_spark.functions.textnorm import deterministic_id


def auto_decision_col(geo_gated: bool = False, det_gated: bool = False) -> F.Column:
    """``geo_gated``: apply the borderline second factor — a FUZZY score in
    [AUTO_MATCH_THRESHOLD, BORDERLINE_GEO_CEILING) with a geographic
    contradiction demotes to review (config.BORDERLINE_GEO_CEILING
    rationale; build_candidates enables this when the scored frame carries
    the geo_contradiction column).

    ``det_gated``: apply the exact-identifier second factor — a DET pair
    whose geography contradicts AND whose name score sits below
    config.DET_NAME_FLOOR demotes to review instead of auto-matching
    (identifier collision/typo/reuse; config.DET_NAME_FLOOR rationale).
    Enabled when the frame additionally carries score_name."""
    geo_bad = F.coalesce(F.col("geo_contradiction"), F.lit(False))
    automatch_ok = F.col("overall_score") >= AUTO_MATCH_THRESHOLD
    if geo_gated:
        automatch_ok = automatch_ok & (
            (F.col("overall_score") >= BORDERLINE_GEO_CEILING) | ~geo_bad
        )
    det = F.col("match_rule").isin("DET-1", "DET-2", "DET-3")
    decision = F.when(det, "auto_match")
    if det_gated:
        det_collision = (
            det
            & geo_bad
            # null-safe: a missing name is absence of evidence, not
            # contradiction — only an AFFIRMATIVELY weak name demotes
            & (F.col("score_name") < F.lit(DET_NAME_FLOOR))
        )
        decision = F.when(det_collision, "review").when(det, "auto_match")
    return (
        decision
        .when(automatch_ok, "auto_match")
        .when(F.col("overall_score") >= REVIEW_THRESHOLD, "review")
        .otherwise("auto_no_match")
    )


def final_decision_col() -> F.Column:
    """Steward overrides auto (match_candidates.sql:55-63)."""
    return (
        F.when(F.col("steward_decision") == "confirmed_match", "match")
        .when(F.col("steward_decision") == "confirmed_no_match", "no_match")
        .when(F.col("auto_decision") == "auto_match", "match")
        .otherwise("no_match")
    )


def build_candidates(
    scored: DataFrame,
    steward_decisions: DataFrame | None = None,
    run_ts: str | None = None,
) -> DataFrame:
    """Scored pairs (+ optional steward write-back table) -> candidates.

    ``steward_decisions``: DataFrame[candidate_id, steward_decision,
    steward_user, steward_timestamp, steward_notes] — the Iceberg table the
    review UI writes (app/src/pages/MatchReview.tsx:84-85 analog). The
    re-derivation of final_decision from a fresh steward snapshot is exactly
    the reference's selective-rebuild path (SURVEY §3.3).
    """
    df = scored.withColumn(
        "candidate_id",
        deterministic_id(F.col("source_record_id_a"), F.col("source_record_id_b")),
    ).withColumn(
        "auto_decision",
        auto_decision_col(
            # kill-switches (config.ENABLE_*_GATE, read at call time —
            # ADVICE r04) AND the columns the gate needs must both be
            # present; otherwise the reference's plain-threshold
            # semantics (match_candidates.sql:33-39) apply unchanged.
            geo_gated=config.ENABLE_GEO_GATE
            and "geo_contradiction" in scored.columns,
            det_gated=config.ENABLE_DET_GATE
            and "geo_contradiction" in scored.columns
            and "score_name" in scored.columns,
        ),
    )

    if steward_decisions is not None:
        overlay = steward_decisions.select(
            "candidate_id", "steward_decision", "steward_user",
            "steward_timestamp", "steward_notes",
        )
        df = df.join(F.broadcast(overlay), "candidate_id", "left")
    else:
        df = (
            df.withColumn("steward_decision", F.lit(None).cast("string"))
            .withColumn("steward_user", F.lit(None).cast("string"))
            .withColumn("steward_timestamp", F.lit(None).cast("timestamp"))
            .withColumn("steward_notes", F.lit(None).cast("string"))
        )

    df = df.withColumn("final_decision", final_decision_col())
    if run_ts is not None:
        df = df.withColumn("created_at", F.lit(run_ts).cast("timestamp"))
    return df

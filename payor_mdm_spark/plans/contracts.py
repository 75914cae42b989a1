"""Post-run data contracts: the `dbt test` analog.

Mirrors the reference's schema tests (transform/payor_mdm/models/match/
schema.yml + master/schema.yml: not_null, unique, accepted_values) plus the
referential checks its UI assumes (xref/hierarchy ids resolve to golden,
no self-edges, bounded scores). Every check is one native Spark count —
run them after a pipeline (CLI: `jobs/run_pipeline.py --validate`) the way
`dbt test` follows `dbt run`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from payor_mdm_spark.sources.catalog import CheckpointStore


@dataclass
class CheckResult:
    table: str
    check: str
    passed: bool
    failing_rows: int


def _not_null(df: DataFrame, cols: list[str]) -> int:
    cond = None
    for c in cols:
        p = F.col(c).isNull()
        cond = p if cond is None else cond | p
    return df.filter(cond).count()


def _not_unique(df: DataFrame, cols: list[str]) -> int:
    return df.groupBy(*cols).count().filter("count > 1").count()


def _not_in(df: DataFrame, col: str, values: list[str]) -> int:
    return df.filter(~F.col(col).isin(*values) | F.col(col).isNull()).count()


def _dangling(child: DataFrame, col: str, parent: DataFrame, pcol: str) -> int:
    return child.join(
        parent.select(F.col(pcol).alias(col)).distinct(), col, "left_anti"
    ).count()


def validate_store(store: CheckpointStore) -> list[CheckResult]:
    """Run every contract against the committed tables; returns one
    CheckResult per (table, check)."""
    t = {name: store.read(name) for name in (
        "staged", "blocking_pairs", "scored_pairs", "match_candidates",
        "match_groups", "survived", "golden", "xref", "hierarchy",
    ) if store.exists(name)}
    out: list[CheckResult] = []

    def add(table: str, check: str, failing: int) -> None:
        out.append(CheckResult(table, check, failing == 0, failing))

    if "staged" in t:
        add("staged", "source_record_id not_null",
            _not_null(t["staged"], ["source_record_id"]))
        add("staged", "source_record_id unique",
            _not_unique(t["staged"], ["source_record_id"]))
    if "blocking_pairs" in t:
        add("blocking_pairs", "ids not_null",
            _not_null(t["blocking_pairs"],
                      ["source_record_id_a", "source_record_id_b"]))
        add("blocking_pairs", "canonical ordering a<b",
            t["blocking_pairs"].filter(
                F.col("source_record_id_a") >= F.col("source_record_id_b")
            ).count())
    if "scored_pairs" in t:
        add("scored_pairs", "ids/score/rule not_null",
            _not_null(t["scored_pairs"],
                      ["source_record_id_a", "source_record_id_b",
                       "overall_score", "match_rule"]))
    if "match_candidates" in t:
        mc = t["match_candidates"]
        add("match_candidates", "candidate_id not_null",
            _not_null(mc, ["candidate_id"]))
        add("match_candidates", "candidate_id unique",
            _not_unique(mc, ["candidate_id"]))
        add("match_candidates", "auto_decision accepted_values",
            _not_in(mc, "auto_decision",
                    ["auto_match", "review", "auto_no_match"]))
        add("match_candidates", "final_decision accepted_values",
            _not_in(mc, "final_decision", ["match", "no_match"]))
    if "match_groups" in t:
        add("match_groups", "source_record_id unique",
            _not_unique(t["match_groups"], ["source_record_id"]))
        add("match_groups", "ids not_null",
            _not_null(t["match_groups"],
                      ["match_group_id", "source_record_id"]))
    if "survived" in t:
        add("survived", "match_group_id unique",
            _not_unique(t["survived"], ["match_group_id"]))
    if "golden" in t:
        g = t["golden"]
        add("golden", "master_entity_id unique",
            _not_unique(g, ["master_entity_id"]))
        add("golden", "name_raw not_null", _not_null(g, ["name_raw"]))
        add("golden", "completeness in [0,1]",
            g.filter((F.col("completeness_score") < 0)
                     | (F.col("completeness_score") > 1)).count())
    if "xref" in t and "golden" in t:
        add("xref", "source_record_id unique",
            _not_unique(t["xref"], ["source_record_id"]))
        add("xref", "master_entity_id references golden",
            _dangling(t["xref"], "master_entity_id",
                      t["golden"], "master_entity_id"))
    if "staged" in t and "xref" in t:
        add("xref", "every staged record mapped",
            _dangling(t["staged"].select("source_record_id"),
                      "source_record_id", t["xref"], "source_record_id"))
    if "hierarchy" in t and "golden" in t:
        h = t["hierarchy"]
        add("hierarchy", "no self edges",
            h.filter(F.col("parent_master_id") == F.col("child_master_id")).count())
        for side in ("parent_master_id", "child_master_id"):
            add("hierarchy", f"{side} references golden",
                _dangling(h, side, t["golden"], "master_entity_id"))

    # training-corpus pipeline tables (plans/docs_pipeline.py), if present
    d = {name: store.read(name) for name in (
        "doc_keepers", "doc_splits", "doc_packed",
    ) if store.exists(name)}
    if "doc_keepers" in d:
        add("doc_keepers", "doc_id unique", _not_unique(d["doc_keepers"], ["doc_id"]))
    if "doc_splits" in d:
        add("doc_splits", "split accepted_values",
            _not_in(d["doc_splits"], "split", ["train", "val", "test"]))
    if "doc_packed" in d:
        add("doc_packed", "offsets/bins non-negative",
            d["doc_packed"].filter(
                (F.col("bin_offset") < 0) | (F.col("bin_id") < 0)
                | (F.col("token_count") < 0)
            ).count())
        if "doc_splits" in d:
            add("doc_packed", "packed docs reference keepers",
                _dangling(d["doc_packed"].select("doc_id"), "doc_id",
                          d["doc_splits"], "doc_id"))
    return out

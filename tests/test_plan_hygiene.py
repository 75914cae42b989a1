"""Plan-hygiene guardrail: no accidental cartesian products.

Every queries() entry is compiled at sf0.001 and its physical plan is
scanned for CartesianProduct / BroadcastNestedLoopJoin nodes — the two
shapes that silently turn into O(n^2) compare work at the 100 TB point
(the round-1 hierarchy join regression class). Queries that are
EXACT-by-design full scans are explicitly allow-listed with the reason.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# intentional full-compare baselines — each documented
ALLOWED_NESTED_LOOP = {
    # exact brute-force cosine top-k IS the full scan baseline; the scale
    # paths are ann_lsh_topk / IVF
    "ann_brute_force_topk",
}


def _queries():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.queries()


QUERIES = _queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_nested_loop(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name in ALLOWED_NESTED_LOOP:
        pytest.skip("exact full-compare baseline by design")
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join"
    )


# ---------------------------------------------------------------------------
# VERDICT r02 item 8: the same guardrail over the PIPELINE stage frames —
# queries() covers the operator surface, but the ER / docs DAG wire their
# own stage compositions, which must stay cartesian-free too.
# ---------------------------------------------------------------------------

def _assert_clean(name, df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join"
    )


@pytest.fixture(scope="module")
def er_stage_frames(spark, tmp_path_factory):
    from payor_mdm_spark.datagen.transcripts import generate_world, write_world
    from payor_mdm_spark.operators.blocking import candidate_pairs
    from payor_mdm_spark.operators.candidates import build_candidates
    from payor_mdm_spark.operators.clustering import build_match_groups
    from payor_mdm_spark.operators.golden import build_xref, golden_records
    from payor_mdm_spark.operators.hierarchy import infer_hierarchy
    from payor_mdm_spark.operators.rollup import rollup_conversations
    from payor_mdm_spark.operators.scoring import score_pairs
    from payor_mdm_spark.operators.staging import stage_records
    from payor_mdm_spark.operators.survivorship import survive_groups

    out = tmp_path_factory.mktemp("hygiene_world")
    turns_path, _ = write_world(generate_world(seed=7, n_entities=20), str(out))
    turns = spark.read.parquet(turns_path)
    staged = stage_records(spark, rollup_conversations(turns)).cache()
    pairs = candidate_pairs(staged)
    scored = score_pairs(pairs, staged)
    candidates = build_candidates(scored)
    groups = build_match_groups(candidates, staged)
    survived = survive_groups(groups, staged)
    golden = golden_records(survived)
    xref = build_xref(groups, staged)
    return {
        "staged": staged,
        "blocking_pairs": pairs,
        "scored_pairs": scored,
        "match_candidates": candidates,
        "match_groups": groups,
        "survived": survived,
        "golden": golden,
        "xref": xref,
        "hierarchy": infer_hierarchy(staged, xref, golden),
    }


ER_STAGES = [
    "staged", "blocking_pairs", "scored_pairs", "match_candidates",
    "match_groups", "survived", "golden", "xref", "hierarchy",
]


@pytest.mark.parametrize("stage", ER_STAGES)
def test_er_pipeline_stage_plans_clean(er_stage_frames, stage):
    _assert_clean(stage, er_stage_frames[stage])


def test_docs_pipeline_stage_plans_clean(spark):
    from pyspark.sql import functions as F

    from payor_mdm_spark.operators.dedup import (
        dedup_clusters, exact_dedup, minhash_dedup_pairs,
    )
    from payor_mdm_spark.operators.text_analysis import (
        analyze_documents, pack_sequences, redact_pii_col,
        repetition_signals, split_assignment_col,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = analyze_documents(docs).join(repetition_signals(docs), "doc_id")
    filtered = stats.filter(
        (F.col("quality_score") >= 0.3) & (F.col("dup_ngram_ratio") <= 0.9)
    ).withColumn("text", redact_pii_col(F.col("text")))
    exact = exact_dedup(filtered)
    pairs = minhash_dedup_pairs(exact, jaccard_threshold=0.8)
    clustered = dedup_clusters(exact.select("doc_id"), pairs)
    keepers = exact.join(
        clustered.filter("is_keeper").select("doc_id"), "doc_id", "semi"
    )
    splits = keepers.withColumn("split", split_assignment_col(F.col("doc_id")))
    packed = pack_sequences(splits.filter(F.col("split") == "train"), 2048)
    for name, df in [
        ("doc_stats", stats), ("doc_filtered", filtered), ("doc_exact", exact),
        ("doc_minhash_pairs", pairs), ("doc_clusters", clustered),
        ("doc_keepers", keepers), ("doc_splits", splits), ("doc_packed", packed),
    ]:
        _assert_clean(name, df)

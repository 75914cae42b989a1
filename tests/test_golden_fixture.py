"""Frozen end-to-end golden fixture (FIXTURES.md §3-§5): the seed-42 world
must reproduce the pinned candidate counts, decision mix, cluster
assignments and golden names EXACTLY — across partitionings, core counts,
and refactors. Regenerate intentionally via tools/make_golden_fixture.py."""

import json
import os

import pytest

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_n65_seed42.json")


@pytest.fixture(scope="module")
def fixture():
    with open(_FIXTURE) as f:
        return json.load(f)


def test_pipeline_reproduces_golden_fixture(pipeline_run, fixture):
    t = pipeline_run["res"].tables
    assert t["staged"].count() == fixture["staged_rows"]
    assert t["blocking_pairs"].count() == fixture["blocking_pairs"]
    decisions = {
        r["final_decision"]: r["count"]
        for r in t["match_candidates"].groupBy("final_decision").count().collect()
    }
    assert decisions == fixture["decisions"]
    rules = {
        r["match_rule"]: r["count"]
        for r in t["match_candidates"].groupBy("match_rule").count().collect()
    }
    assert rules == fixture["match_rules"]
    assert t["golden"].count() == fixture["n_groups"]
    assert t["hierarchy"].count() == fixture["hierarchy_rows"]

    xref = sorted(
        (r.source_record_id, r.master_entity_id)
        for r in t["xref"].select("source_record_id", "master_entity_id").collect()
    )
    import hashlib

    assert hashlib.md5(json.dumps(xref).encode()).hexdigest() == fixture["xref_digest"]
    assert [list(x) for x in xref[:25]] == fixture["xref_sample"]

    golden_names = sorted(r.name_raw for r in t["golden"].select("name_raw").collect())
    assert golden_names[:15] == fixture["golden_names_sample"]

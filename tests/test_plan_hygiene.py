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

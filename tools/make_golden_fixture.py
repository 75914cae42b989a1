"""Generate tests/fixtures/golden_n65_seed42.json — the frozen end-to-end
fixture (FIXTURES.md §3-§5 analog): counts, decision mix, cluster
assignments, and survived fields for the seed-42 / 65-entity world.

Regenerate ONLY on an intentional semantic change:
    PYTHONPATH=. python tools/make_golden_fixture.py
"""

from __future__ import annotations

import json
import os
import tempfile


def build_fixture() -> dict:
    from pyspark.sql import functions as F

    from payor_mdm_spark.datagen.transcripts import generate_world, write_world
    from payor_mdm_spark.plans.pipeline import run_pipeline
    from payor_mdm_spark.session import get_spark
    from payor_mdm_spark.sources.catalog import CheckpointStore

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp()
    turns_path, _ = write_world(generate_world(42, 65), d)
    res = run_pipeline(
        spark, spark.read.parquet(turns_path),
        CheckpointStore(spark, d + "/ckpt"), collect_metrics=False,
    )
    t = res.tables
    decisions = {
        r["final_decision"]: r["count"]
        for r in t["match_candidates"].groupBy("final_decision").count().collect()
    }
    rules = {
        r["match_rule"]: r["count"]
        for r in t["match_candidates"].groupBy("match_rule").count().collect()
    }
    xref = sorted(
        (r.source_record_id, r.master_entity_id)
        for r in t["xref"].select("source_record_id", "master_entity_id").collect()
    )
    golden_names = sorted(
        r.name_raw for r in t["golden"].select("name_raw").collect()
    )
    return {
        "staged_rows": t["staged"].count(),
        "blocking_pairs": t["blocking_pairs"].count(),
        "decisions": decisions,
        "match_rules": rules,
        "n_groups": t["golden"].count(),
        "hierarchy_rows": t["hierarchy"].count(),
        "xref_sample": xref[:25],
        "xref_digest": __import__("hashlib").md5(
            json.dumps(xref).encode()
        ).hexdigest(),
        "golden_names_sample": golden_names[:15],
    }


if __name__ == "__main__":
    fixture = build_fixture()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "golden_n65_seed42.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(fixture, f, indent=1, sort_keys=True)
    print("wrote", out)

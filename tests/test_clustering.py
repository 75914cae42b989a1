"""Clustering topology micro-fixtures (FIXTURES.md §6): the cases the
reference's fixed-2-pass SQL variant gets wrong (match_groups.sql:43-44) —
our label propagation must reach fixpoint beyond 2 hops."""

from pyspark.sql import functions as F

from payor_mdm_spark.operators.clustering import build_match_groups, propagate_labels


def _components(spark, edges, nodes):
    e = spark.createDataFrame(
        edges, "source_record_id_a string, source_record_id_b string"
    )
    n = spark.createDataFrame([(x,) for x in nodes], "source_record_id string")
    rows = propagate_labels(e, n).collect()
    return {r.source_record_id: r.component for r in rows}


def test_chain_of_five(spark):
    comp = _components(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        ["a", "b", "c", "d", "e"],
    )
    assert set(comp.values()) == {"a"}


def test_star(spark):
    comp = _components(
        spark, [("hub", "s1"), ("hub", "s2"), ("hub", "s3")], ["hub", "s1", "s2", "s3"]
    )
    assert set(comp.values()) == {"hub"}


def test_two_cliques_bridged(spark):
    edges = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
             ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
             ("a3", "b1")]
    nodes = ["a1", "a2", "a3", "b1", "b2", "b3"]
    comp = _components(spark, edges, nodes)
    assert set(comp.values()) == {"a1"}


def test_singleton_and_separate_components(spark):
    comp = _components(spark, [("a", "b")], ["a", "b", "lone"])
    assert comp["a"] == comp["b"] == "a"
    assert comp["lone"] == "lone"


def test_long_chain_beyond_two_passes(spark):
    # 9-node chain: diameter 8 — requires >2 min-propagation rounds
    nodes = [f"n{i}" for i in range(9)]
    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]
    comp = _components(spark, edges, nodes)
    assert set(comp.values()) == {"n0"}


def test_build_match_groups_semantics(spark):
    candidates = spark.createDataFrame(
        [
            ("a", "b", 0.9, "match"),
            ("b", "c", 0.95, "match"),
            ("x", "y", 0.7, "no_match"),
        ],
        "source_record_id_a string, source_record_id_b string, "
        "overall_score double, final_decision string",
    )
    staged = spark.createDataFrame(
        [("a", 2), ("b", 1), ("c", 3), ("x", 1), ("y", 2)],
        "source_record_id string, source_trust_rank int",
    )
    rows = build_match_groups(candidates, staged).collect()
    by_id = {r.source_record_id: r for r in rows}
    # a,b,c one group; x,y singletons (edge was no_match)
    assert by_id["a"].match_group_id == by_id["b"].match_group_id == by_id["c"].match_group_id
    assert by_id["x"].match_group_id != by_id["y"].match_group_id
    # survivor = lowest trust rank (b has rank 1)
    assert by_id["b"].is_survivor and not by_id["a"].is_survivor
    # group_confidence = avg(0.9, 0.95) rounded 4
    assert abs(by_id["a"].group_confidence - 0.925) < 1e-9
    # singleton confidence is NULL
    assert by_id["x"].group_confidence is None
    # deterministic group id: md5 of the component anchor (min member id)
    import hashlib

    assert by_id["a"].match_group_id == hashlib.md5(b"a").hexdigest()


def test_store_backed_checkpointing_identical_components(spark, tmp_path):
    """VERDICT r02 item 5: the reliable (CheckpointStore-committed)
    lineage-truncation path must produce exactly the local-checkpoint
    components, and must actually commit labels every store_every rounds
    (both alternating tables written for a long enough chain)."""
    import os

    from payor_mdm_spark.sources.catalog import CheckpointStore

    nodes = [f"n{i:03d}" for i in range(40)]
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(39)]
    e = spark.createDataFrame(
        edges, "source_record_id_a string, source_record_id_b string"
    )
    n = spark.createDataFrame([(x,) for x in nodes], "source_record_id string")

    local = {r.source_record_id: r.component for r in propagate_labels(e, n).collect()}

    store = CheckpointStore(spark, str(tmp_path / "cc"))
    durable = {
        r.source_record_id: r.component
        for r in propagate_labels(e, n, store=store, store_every=2).collect()
    }
    assert durable == local
    assert set(local.values()) == {"n000"}
    written = {d for d in os.listdir(tmp_path / "cc") if d.startswith("cc_labels")}
    assert written == {"cc_labels_0", "cc_labels_1"}  # >= 4 rounds -> both slots

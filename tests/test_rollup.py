"""Rollup invariants: stable turn ordering + per-turn text equality
(BASELINE.json input_hint: 'per-turn text equality under stable turn
ordering')."""

from pyspark.sql import functions as F

from payor_mdm_spark.operators.rollup import rollup_conversations


def test_turns_sorted_and_text_preserved(spark, world):
    turns = spark.read.parquet(world["turns_path"])
    rolled = rollup_conversations(turns)

    # stable ordering: the packed array is sorted by turn_idx
    bad_order = rolled.filter(
        F.exists(
            F.zip_with(
                F.col("turns"),
                F.slice(F.col("turns"), 2, F.size("turns")),
                lambda a, b: a["turn_idx"] >= b["turn_idx"],
            ),
            lambda x: x,
        )
    ).count()
    assert bad_order == 0

    # per-turn text equality: exploding the packed turns reproduces the
    # input rows exactly
    exploded = rolled.select(
        "conv_id", F.explode("turns").alias("t")
    ).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
    )
    orig = turns.select("conv_id", "turn_idx", "role", "text")
    assert exploded.count() == orig.count()
    assert exploded.exceptAll(orig).count() == 0
    assert orig.exceptAll(exploded).count() == 0


def test_one_row_per_conversation(spark, world):
    turns = spark.read.parquet(world["turns_path"])
    rolled = rollup_conversations(turns)
    assert rolled.count() == turns.select("conv_id").distinct().count()
    assert rolled.groupBy("conv_id").count().filter("count > 1").count() == 0


def test_extraction_fields_present(spark, world):
    turns = spark.read.parquet(world["turns_path"])
    rolled = rollup_conversations(turns)
    # every conversation opens with a name utterance
    assert rolled.filter(F.col("name_raw").isNull()).count() == 0
    # loaded_at is the max turn ts
    chk = rolled.join(
        turns.groupBy("conv_id").agg(F.max("ts").alias("want")), "conv_id"
    )
    assert chk.filter(F.col("loaded_at") != F.col("want")).count() == 0

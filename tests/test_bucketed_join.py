"""Co-located joins via bucketed tables: the shuffle-elimination evidence.

The 100 TB design point bucket-partitions the landing/staged tables on
their join keys (Iceberg bucket(N, col) transform — contract-tested in
test_iceberg_contract.py; Spark managed tables via bucketBy). This test
proves the payoff end-to-end on the builtin catalog: a pair->record
rehydration-shaped join between two tables bucketed on the join key runs
with ZERO Exchange nodes — the sort-merge join reads co-located buckets
directly. At 6.4M pairs (the 30k-entity world) that shuffle is the
scoring stage's dominant data movement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_rehydration_join_has_no_exchange(spark, no_broadcast):
    staged_like = spark.range(20000).select(
        F.concat(F.lit("rec"), F.col("id").cast("string")).alias("source_record_id"),
        F.concat(F.lit("NAME "), (F.col("id") % 500).cast("string")).alias("name_norm"),
    )
    pairs_like = spark.range(60000).select(
        F.concat(F.lit("rec"), (F.col("id") % 20000).cast("string")).alias(
            "source_record_id_a"
        ),
        F.concat(F.lit("rec"), ((F.col("id") * 7) % 20000).cast("string")).alias(
            "source_record_id_b"
        ),
    )
    spark.sql("DROP TABLE IF EXISTS bkt_staged")
    spark.sql("DROP TABLE IF EXISTS bkt_pairs")
    (staged_like.write.bucketBy(16, "source_record_id")
     .sortBy("source_record_id").mode("overwrite").saveAsTable("bkt_staged"))
    (pairs_like.write.bucketBy(16, "source_record_id_a")
     .sortBy("source_record_id_a").mode("overwrite").saveAsTable("bkt_pairs"))

    joined = spark.table("bkt_pairs").join(
        spark.table("bkt_staged"),
        F.col("source_record_id_a") == F.col("source_record_id"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: zero shuffle
    assert joined.count() == 60000

    # the unbucketed control DOES shuffle — the test is meaningful
    control = pairs_like.join(
        staged_like, F.col("source_record_id_a") == F.col("source_record_id")
    )
    control_plan = control._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in control_plan
    spark.sql("DROP TABLE IF EXISTS bkt_staged")
    spark.sql("DROP TABLE IF EXISTS bkt_pairs")

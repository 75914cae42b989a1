"""Hierarchy inference between golden records.

Mirrors /root/reference/transform/payor_mdm/models/master/
int_hierarchy_inferred.sql + payor_hierarchy.sql. Two signals:

  1. name_ref_match — a source record's parent_ref equals another golden
     record's name (equi join on normalized expressions, J6, :30-43);
  2. name_substring — one golden name contains another (child longer,
     parent >= 6 chars, J7, :47-62). The golden side is broadcast — golden
     is orders of magnitude smaller than staged; at extreme scale a
     token-prefix pre-join bounds the candidate space (SURVEY §2.3 J7).

Hierarchy ids are deterministic (md5 of parent|child|method) instead of
uuid_string() (payor_hierarchy.sql:11; SURVEY §2.7 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from payor_mdm_spark.functions.textnorm import deterministic_id


def infer_hierarchy(
    staged: DataFrame, xref: DataFrame, golden: DataFrame
) -> DataFrame:
    g = golden.select(
        F.col("master_entity_id"), F.col("name_raw"),
        F.upper(F.trim("name_raw")).alias("_name_u"),
    )

    # Signal 1: parent_ref name match
    refs = staged.filter(
        F.col("parent_ref").isNotNull() & (F.col("parent_ref") != "")
    ).select("source_record_id", F.upper(F.trim("parent_ref")).alias("_ref_u"))
    sig1 = (
        refs.join(xref.select("source_record_id", F.col("master_entity_id").alias("child_master_id")), "source_record_id")
        .join(
            F.broadcast(g.select(F.col("master_entity_id").alias("parent_master_id"), "_name_u")),
            F.col("_ref_u") == F.col("_name_u"),
        )
        .filter(F.col("parent_master_id") != F.col("child_master_id"))
        .select("parent_master_id", "child_master_id")
        .distinct()
        .withColumn("inference_method", F.lit("name_ref_match"))
    )

    # Signal 2: substring containment over golden x golden
    gp = g.select(
        F.col("master_entity_id").alias("parent_master_id"),
        F.col("_name_u").alias("_pname"),
    )
    gc = g.select(
        F.col("master_entity_id").alias("child_master_id"),
        F.col("_name_u").alias("_cname"),
    )
    sig2 = (
        gc.join(F.broadcast(gp), F.col("parent_master_id") != F.col("child_master_id"))
        .filter(
            F.contains(F.col("_cname"), F.col("_pname"))
            & (F.length("_pname") >= 6)
            & (F.length("_cname") > F.length("_pname"))
        )
        .select("parent_master_id", "child_master_id")
        .distinct()
        .withColumn("inference_method", F.lit("name_substring"))
    )

    combined = sig1.unionByName(sig2).distinct()
    return (
        combined.filter(F.col("parent_master_id") != F.col("child_master_id"))
        .withColumn(
            "hierarchy_id",
            deterministic_id(
                F.col("parent_master_id"), F.col("child_master_id"),
                F.col("inference_method"),
            ),
        )
        .withColumn("relationship_type", F.lit("parent_company"))
        .withColumn("steward_confirmed", F.lit(False))
        .select(
            "hierarchy_id", "parent_master_id", "child_master_id",
            "relationship_type", "inference_method", "steward_confirmed",
        )
    )

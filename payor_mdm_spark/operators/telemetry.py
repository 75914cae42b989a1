"""Blocking / pipeline telemetry (metrics tables, north_rule).

At 100 TB the blocking layer is the first thing to go wrong silently —
a null-fill bucket or a dominant name prefix quietly going quadratic.
These rollups make the block-size distribution, salting pressure, and
per-pass pair yield first-class tables written next to the run metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_KEY_COLUMNS = (
    "block_exact_key", "block_name_key", "block_zip3_name4", "block_abbr_key",
)


def block_size_stats(staged: DataFrame, max_block_size: int) -> DataFrame:
    """Per blocking key: block count, size distribution, hot-block count
    (blocks above the salting cap) and the implied pre-salt pair blowup."""
    outs = []
    for key in BLOCK_KEY_COLUMNS:
        if key not in staged.columns:
            continue
        sizes = (
            staged.filter(F.col(key).isNotNull() & (F.col(key) != ""))
            .groupBy(F.col(key).alias("_k"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        outs.append(
            sizes.agg(
                F.lit(key).alias("block_key"),
                F.count(F.lit(1)).alias("n_blocks"),
                F.max("_n").alias("max_block_size"),
                F.expr("percentile_approx(_n, 0.5)").alias("p50_block_size"),
                F.expr("percentile_approx(_n, 0.99)").alias("p99_block_size"),
                F.sum(F.when(F.col("_n") > max_block_size, 1).otherwise(0)).alias(
                    "hot_blocks"
                ),
                F.sum((F.col("_n") * (F.col("_n") - 1) / 2).cast("long")).alias(
                    "presalt_pairs"
                ),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def pair_yield_by_pass(pairs: DataFrame) -> DataFrame:
    """Candidate pairs per blocking pass + exclusivity (pairs only that
    pass found) — measures each pass's marginal recall contribution."""
    exploded = pairs.select(
        F.explode("matched_block_keys").alias("block_pass"),
        (F.size("matched_block_keys") == 1).alias("exclusive"),
    )
    return exploded.groupBy("block_pass").agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(F.col("exclusive").cast("int")).alias("exclusive_pairs"),
    )


def decision_funnel(candidates: DataFrame) -> DataFrame:
    """Pairs by (match_rule, auto_decision) — the thresholding funnel."""
    return (
        candidates.groupBy("match_rule", "auto_decision")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.round(F.avg("overall_score"), 4).alias("avg_score"),
        )
    )

"""End-to-end MDM pipeline driver.

The Spark analog of ``dbt run`` over the reference DAG (SURVEY §3.1):
staging(rollup) -> blocking -> scoring -> candidates -> match_groups ->
{survivorship, xref} -> golden -> hierarchy, each stage ending in a
checkpointed table write (resumable; north_rule). A per-stage metrics table
(row counts, durations, per-stage lineage) is appended as the run progresses
— the per-partition lineage/metrics requirement at scale.

No wall-clock leaks into data: ``run_ts`` is stamped once per run and passed
to every stage that needs a timestamp (vs the reference's per-row
current_timestamp(), match_candidates.sql:47).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payor_mdm_spark.operators.blocking import candidate_pairs
from payor_mdm_spark.operators.candidates import build_candidates
from payor_mdm_spark.operators.clustering import build_match_groups
from payor_mdm_spark.operators.golden import build_xref, golden_records
from payor_mdm_spark.operators.hierarchy import (
    apply_hierarchy_overrides,
    infer_hierarchy,
)
from payor_mdm_spark.operators.rollup import rollup_conversations
from payor_mdm_spark.operators.scoring import add_geo_contradiction, score_pairs
from payor_mdm_spark.operators.staging import stage_records
from payor_mdm_spark.operators.survivorship import survive_groups
from payor_mdm_spark.sources.catalog import CheckpointStore

STAGES = (
    "staged", "blocking_pairs", "scored_pairs", "match_candidates",
    "match_groups", "survived", "golden", "xref", "hierarchy",
)


@dataclass
class RunResult:
    tables: dict[str, DataFrame]
    metrics: list[dict] = field(default_factory=list)


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    store: CheckpointStore,
    run_ts: str = "2026-01-01 00:00:00",
    resume: bool = False,
    steward_decisions: DataFrame | None = None,
    hierarchy_overrides: DataFrame | None = None,
    survivorship_rules: dict[str, str] | None = None,
    max_block_size: int | None = None,
    shuffle_partitions: int | None = None,
    collect_metrics: bool = True,
    materialize_staging: bool = True,
) -> RunResult:
    """Run (or resume) the full DAG; every stage is checkpointed via
    ``store`` and downstream stages read the committed checkpoint, so a
    killed run restarts from the last completed stage."""
    from payor_mdm_spark.config import MAX_BLOCK_SIZE

    max_block = max_block_size or MAX_BLOCK_SIZE
    result = RunResult(tables={})

    partition_rows: list = []

    def stage(name: str, build):
        t0 = time.time()
        if resume and store.exists(name):
            df = store.read(name)
            skipped = True
        else:
            df = build()
            store.write(name, df)
            df = store.read(name)  # downstream reads the committed snapshot
            skipped = False
        result.tables[name] = df
        if collect_metrics:
            # per-partition lineage (north_rule): row counts from the COMMIT
            # itself — parquet footers / Iceberg manifest stats — never a
            # second scan of the stage output (VERDICT r01 item 3: the old
            # groupBy(spark_partition_id()).count() doubled read I/O at the
            # 100 TB design point)
            parts = store.commit_stats(name)
            for pid, nrows in parts:
                partition_rows.append((name, pid, nrows, run_ts))
            result.metrics.append(
                {
                    "stage": name,
                    "rows": sum(nrows for _, nrows in parts),
                    "seconds": round(time.time() - t0, 3),
                    "skipped": skipped,
                    "run_ts": run_ts,
                }
            )
        return df

    if materialize_staging:
        staged = stage(
            "staged", lambda: stage_records(spark, rollup_conversations(turns))
        )
    else:
        # reference parity: dbt materializes the staging layer as VIEWS
        # (dbt_project.yml:18-20) — only match/master become tables. The
        # cache must be EAGER: the blocking stage's single write job
        # branches over staged 6+ ways, and an unmaterialized cache would
        # re-execute the rollup lineage per branch.
        t0 = time.time()
        staged = stage_records(spark, rollup_conversations(turns)).cache()
        staged.count()
        if collect_metrics:
            result.metrics.append(
                {"stage": "staged(view)", "rows": staged.count(),
                 "seconds": round(time.time() - t0, 3), "skipped": False,
                 "run_ts": run_ts}
            )
    # staged is scanned by every blocking pass and both sides of the scoring
    # rehydration join — cache it (committed snapshot or view) WITHOUT the
    # packed-turns payload: no downstream stage reads `turns` (it lives in
    # the committed staged table for the record contract), and columnar-
    # caching the full conversation text roughly doubled the blocking
    # stage's cost at the 30k-entity bench point (guide §2.3: keys and
    # metadata travel, payloads don't; §5: caching competes with execution
    # memory).
    staged = staged.drop("turns").cache()
    result.tables["staged"] = staged
    pairs = stage(
        "blocking_pairs",
        lambda: candidate_pairs(staged, max_block_size=max_block),
    )
    # dict-as-data: the seeded ABBREVIATION_DICT table (incl. steward MERGE
    # upserts) drives the ensemble router, mirroring survivorship_config;
    # config.ABBREVS is the fallback when the table was never seeded
    from payor_mdm_spark.sources.steward import load_abbreviation_dict

    abbrevs = load_abbreviation_dict(store)
    scored = stage(
        "scored_pairs",
        lambda: score_pairs(pairs, staged, shuffle_partitions=shuffle_partitions,
                            abbrevs=abbrevs),
    )
    candidates = stage(
        "match_candidates",
        lambda: build_candidates(scored, steward_decisions=steward_decisions, run_ts=run_ts),
    )
    groups = stage(
        "match_groups", lambda: build_match_groups(candidates, staged)
    )
    # rules-as-data: an explicit dict wins; otherwise the seeded
    # SURVIVORSHIP_CONFIG table (sources/steward.seed_survivorship_config)
    # drives the aggregation; the config constants are the last fallback
    rules = survivorship_rules
    if rules is None and store.exists("survivorship_config"):
        rules = {
            r["field_name"]: r["rule"]
            for r in store.read("survivorship_config").collect()
        }
    survived = stage("survived", lambda: survive_groups(groups, staged, rules=rules))
    golden = stage("golden", lambda: golden_records(survived, run_ts=run_ts))
    xref = stage("xref", lambda: build_xref(groups, staged))
    stage(
        "hierarchy",
        lambda: apply_hierarchy_overrides(
            infer_hierarchy(staged, xref, golden), hierarchy_overrides
        ),
    )

    if collect_metrics:
        metrics_df = spark.createDataFrame(
            [
                (m["stage"], m["rows"], m["seconds"], m["skipped"], m["run_ts"])
                for m in result.metrics
            ],
            "stage string, rows long, seconds double, skipped boolean, run_ts string",
        )
        store.write("run_metrics", metrics_df)
        partition_df = spark.createDataFrame(
            partition_rows,
            "stage string, partition_id int, rows long, run_ts string",
        )
        store.write("partition_metrics", partition_df)
    return result


def audit_log(
    old: DataFrame | None, new: DataFrame, key: str, run_ts: str
) -> DataFrame:
    """Append-only change log between two golden snapshots
    (MDM_CHANGE_LOG analog, 06_create_audit_tables.sql:18-29)."""
    if old is None:
        return new.select(
            F.col(key).alias("entity_key"),
            F.lit("insert").alias("change_type"),
            F.lit(run_ts).cast("timestamp").alias("changed_at"),
        )
    o = old.select(F.col(key)).withColumn("_o", F.lit(1))
    n = new.select(F.col(key)).withColumn("_n", F.lit(1))
    joined = o.join(n, key, "full_outer")
    return joined.select(
        F.col(key).alias("entity_key"),
        F.when(F.col("_o").isNull(), "insert")
        .when(F.col("_n").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.lit(run_ts).cast("timestamp").alias("changed_at"),
    )


def run_incremental(
    spark: SparkSession,
    delta_turns: DataFrame,
    store: CheckpointStore,
    run_ts: str = "2026-01-01 00:00:00",
    steward_decisions: DataFrame | None = None,
    hierarchy_overrides: DataFrame | None = None,
    survivorship_rules: dict[str, str] | None = None,
    max_block_size: int | None = None,
    shuffle_partitions: int | None = None,
    collect_metrics: bool = True,
) -> RunResult:
    """Process a conversation-granularity delta against an existing run.

    Contract: ``delta_turns`` carries the FULL turn set of every new or
    changed conversation (CDC upsert at conv_id granularity). The pipeline
    then does the minimum scale-relevant work:

    * re-rollup + re-stage ONLY the delta conversations (at the 10^12-turn
      design point staging dominates read I/O — unchanged conversations
      are never re-read);
    * blocking re-runs fully (native column math over the staged table —
      necessary, because a delta record can join or split blocks of
      UNCHANGED records, e.g. sorted-neighborhood adjacency);
    * pairwise scoring — the expensive Python-kernel stage — re-scores
      ONLY pairs that involve a changed record or are newly proposed;
      still-proposed pairs between unchanged records reuse their committed
      scores verbatim (scores are deterministic functions of the two
      records), with matched_block_keys refreshed from the new pair table;
    * the cheap downstream aggregates (candidates, CC, survivorship,
      golden, xref, hierarchy) rebuild via the normal resume path.

    Output tables are bit-identical to a full rebuild on the upserted
    corpus — pinned by tests/test_incremental.py.
    """
    from payor_mdm_spark.config import MAX_BLOCK_SIZE

    for required in ("staged", "scored_pairs"):
        if not store.exists(required):
            raise ValueError(
                f"incremental run needs a committed '{required}' stage; "
                "run run_pipeline() first"
            )
    max_block = max_block_size or MAX_BLOCK_SIZE

    old_staged = store.read("staged")
    # staged carries the conversation id as source_id (operators/staging.py)
    changed_convs = delta_turns.select(F.col("conv_id").alias("source_id")).distinct()
    staged_delta = stage_records(spark, rollup_conversations(delta_turns))
    staged = old_staged.join(changed_convs, "source_id", "left_anti").unionByName(
        staged_delta.select(*old_staged.columns)
    )
    # records whose content changed (old version of changed convs + new
    # versions): any pair touching one of these must be re-scored.
    # MATERIALIZE before the staged overwrite below — the lineage reads the
    # OLD staged files, which the atomic swap deletes.
    changed_ids = (
        old_staged.join(changed_convs, "source_id", "semi")
        .select("source_record_id")
        .unionByName(staged_delta.select("source_record_id"))
        .distinct()
    ).localCheckpoint(eager=True)

    store.write("staged", staged)
    # same pruned cache as run_pipeline: scoring/blocking never read turns
    staged = store.read("staged").drop("turns").cache()

    pairs = candidate_pairs(staged, max_block_size=max_block)
    store.write("blocking_pairs", pairs)
    pairs = store.read("blocking_pairs")

    keys = ["source_record_id_a", "source_record_id_b"]
    old_scored = store.read("scored_pairs")
    reusable = (
        old_scored.drop("matched_block_keys")
        .join(pairs, keys)  # inner: drops no-longer-proposed pairs, refreshes keys
        .join(
            changed_ids.withColumnRenamed("source_record_id", keys[0]),
            keys[0], "left_anti",
        )
        .join(
            changed_ids.withColumnRenamed("source_record_id", keys[1]),
            keys[1], "left_anti",
        )
    )
    to_score = pairs.join(reusable.select(*keys), keys, "left_anti")
    rescored_n = None
    if collect_metrics:
        # incremental lineage: how much Python-kernel work the delta cost —
        # counted BEFORE the scored swap (to_score's lineage reads the old
        # committed scored table) and without touching the kernel (the
        # count needs only pair keys)
        rescored_n = to_score.count()
    from payor_mdm_spark.sources.steward import load_abbreviation_dict

    fresh = score_pairs(to_score, staged, shuffle_partitions=shuffle_partitions,
                        abbrevs=load_abbreviation_dict(store))
    # Recompute geo_contradiction for ALL reused pairs (not just pre-upgrade
    # stores missing the column): the recompute is exact for reused pairs —
    # their staged attributes are unchanged by definition — and it makes a
    # semantic upgrade of the contradiction rule (r4 added zip5) reach pairs
    # committed under the old rule, preserving the incremental == full-rebuild
    # contract across engine upgrades. Cost: one extra equi-join against a
    # 4-column projection of staged. (Applied after to_score so the
    # anti-join plan stays two-table.)
    reusable = add_geo_contradiction(reusable, staged)
    scored = reusable.select(*fresh.columns).unionByName(fresh)
    store.write("scored_pairs", scored)

    # downstream aggregates rebuild through the normal resume machinery
    for stg in (
        "match_candidates", "match_groups", "survived", "golden", "xref",
        "hierarchy",
    ):
        store.drop(stg)
    result = run_pipeline(
        spark, delta_turns, store,
        run_ts=run_ts, resume=True,
        steward_decisions=steward_decisions,
        hierarchy_overrides=hierarchy_overrides,
        survivorship_rules=survivorship_rules,
        max_block_size=max_block,
        shuffle_partitions=shuffle_partitions,
        collect_metrics=collect_metrics,
    )
    if collect_metrics and rescored_n is not None:
        total_n = sum(n for _, n in store.commit_stats("scored_pairs"))
        result.metrics.append(
            {
                "stage": "incremental_rescored_pairs",
                "rows": rescored_n,
                "seconds": 0.0,
                "skipped": False,
                "run_ts": run_ts,
            }
        )
        result.metrics.append(
            {
                "stage": "incremental_reused_pairs",
                "rows": total_n - rescored_n,
                "seconds": 0.0,
                "skipped": True,
                "run_ts": run_ts,
            }
        )
        metrics_df = spark.createDataFrame(
            [
                (m["stage"], m["rows"], m["seconds"], m["skipped"], m["run_ts"])
                for m in result.metrics
            ],
            "stage string, rows long, seconds double, skipped boolean, run_ts string",
        )
        store.write("run_metrics", metrics_df)
    return result

"""Benchmark harness: ER pipeline throughput + headline testdata queries.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pairs_scored": N, "pairs_scored_per_sec": N, ...}

Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_ENTITIES      override ER world size (default scales with sf)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_er_pipeline(spark, n_entities: int) -> dict:
    """Full ER pipeline on a deterministic synthetic world; returns stage
    timings + the headline pairs-scored/sec."""
    from payor_mdm_spark.datagen.transcripts import generate_world, write_world
    from payor_mdm_spark.plans.pipeline import run_pipeline
    from payor_mdm_spark.sources.catalog import CheckpointStore

    # tmpfs-backed world + checkpoints when available: the sandbox's
    # virtual disk throttles to ~4-46 MB/s under fsync (measured; see
    # tools/bench_scaling.py docstring), which turns checkpoint commits
    # into an I/O queue and makes bench numbers measure the disk, not the
    # engine. Real clusters bring real disks per executor.
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="bench_er_", dir=shm)
    t0 = time.time()
    if n_entities > 100000:
        # executor-side sharded generation (r4): the driver-side world
        # build caps out near 100k entities; default bench sizes stay on
        # the sequential path so their numbers remain round-comparable
        from payor_mdm_spark.datagen.transcripts import distributed_world

        turns_df, truth_df = distributed_world(
            spark, 42, max(1, int(n_entities / 2.3))
        )
        turns_df.write.mode("overwrite").parquet(os.path.join(d, "turns"))
        turns_path = os.path.join(d, "turns")
        n_turns = spark.read.parquet(turns_path).count()
        log(f"er: ~{n_entities} entities (sharded), {n_turns} turns "
            f"(gen+write {time.time() - t0:.1f}s)")
        world_turns = n_turns
    else:
        world = generate_world(seed=42, n_entities=n_entities)
        gen_s = time.time() - t0
        turns_path, _ = write_world(world, d)
        log(f"er: {n_entities} entities, {len(world.truth)} convs, "
            f"{len(world.turns)} turns (gen {gen_s:.1f}s)")
        world_turns = len(world.turns)

    turns = spark.read.parquet(turns_path)
    store = CheckpointStore(spark, os.path.join(d, "ckpt"))
    t0 = time.time()
    res = run_pipeline(spark, turns, store)
    total = time.time() - t0
    stage_s = {m["stage"]: m["seconds"] for m in res.metrics}
    rows = {m["stage"]: m["rows"] for m in res.metrics}
    rows.setdefault("scored_pairs", 0)
    pairs = rows.get("scored_pairs", 0)
    scoring_s = stage_s.get("scored_pairs", 1e-9)
    import shutil

    shutil.rmtree(d, ignore_errors=True)  # tmpfs-backed: don't leak RAM
    return {
        "er_total_sec": round(total, 3),
        "er_stage_sec": {k: round(v, 3) for k, v in stage_s.items()},
        "er_rows": rows,
        "pairs_scored": pairs,
        "pairs_scored_per_sec": round(pairs / scoring_s, 1),
        "turns": world_turns,
    }


HEADLINE = [
    "tpch_q1_pricing_summary",
    "blocking_pairs_two_keys",
    "score_jaro_winkler",
    "connected_components",
    "survivorship_rules",
    "dedup_minhash_lsh",
    "ann_brute_force_topk",
    "text_token_stats",
    "events_sessionize",
]


def run_minhash_production(spark, sf_dir):
    """The r1/r2 headline MinHash configuration: the PRODUCTION xxhash64
    hash mode over the same synthesized corpus. The queries() entry now
    runs md5_60bit mode so DuckDB can value-check every stage — a
    deliberate hash-speed-for-checkability trade confined to the oracle
    surface; this keeps the production kernel's round-over-round number
    comparable (bench key: dedup_minhash_lsh)."""
    import pyspark.sql.functions as F

    from payor_mdm_spark.operators.dedup import minhash_dedup_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
    )
    return minhash_dedup_pairs(corpus, jaccard_threshold=0.8)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_entities = int(os.environ.get("BENCH_ENTITIES", max(65, int(sf * 30000))))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from payor_mdm_spark.plans.testdata_queries import Q
    from payor_mdm_spark.session import get_spark

    extra = (
        {"spark.local.dir": "/dev/shm/bench_spark_local"}
        if os.path.isdir("/dev/shm") else {}
    )
    spark = get_spark(
        app_name="payor-mdm-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_confs=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t_all = time.time()
    er = run_er_pipeline(spark, n_entities)

    query_secs: dict[str, float] = {}
    for name in HEADLINE:
        # dedup_minhash_lsh: production xxhash64 mode (round-comparable);
        # the md5 oracle mode is timed separately below
        fn = run_minhash_production if name == "dedup_minhash_lsh" else Q[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        query_secs[name] = round(time.time() - t0, 3)
        log(f"query {name}: {n} rows in {query_secs[name]}s")
    # md5 oracle mode exists for DuckDB value-parity, not throughput; at
    # sf0.1 it was 19% of the headline sum (VERDICT r04 item 4). Time it at
    # sf0.01 under a separate top-level key so the headline reflects
    # production paths while the parity path still gets a measured number.
    oracle_sf_dir = sf_dir.replace("sf0.1", "sf0.01")
    if not os.path.isdir(oracle_sf_dir):
        oracle_sf_dir = sf_dir
    t0 = time.time()
    Q["dedup_minhash_lsh"](spark, oracle_sf_dir).count()
    oracle_mode_sec = round(time.time() - t0, 3)
    # new in r4: exact-substring dup signals in the corpus-scale (token
    # anchor + mod-2 sampling) configuration — its own key; no stable key
    # changes meaning
    t0 = time.time()
    Q["dup_span_signals_token"](spark, sf_dir).count()
    query_secs["dup_span_signals_token"] = round(time.time() - t0, 3)
    total = time.time() - t_all

    out = {
        "metric": "er_pipeline+headline_queries wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {**query_secs, "er_pipeline": er["er_total_sec"]},
        "sf": sf,
        "cpus": cpus,
        "entities": n_entities,
        "turns": er["turns"],
        "pairs_scored": er["pairs_scored"],
        "pairs_scored_per_sec": er["pairs_scored_per_sec"],
        "er_stage_sec": er["er_stage_sec"],
        "dedup_minhash_md5_oracle_mode_sf001_sec": oracle_mode_sec,
    }
    # fold in the separately-measured evidence (tools/bench_scaling.py and
    # tools/eval_f1.py persist their latest results under BENCH/) so the
    # headline JSON is self-contained
    here = os.path.dirname(os.path.abspath(__file__))
    scaling_path = os.path.join(here, "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        out["kernel_pairs_per_sec_local8"] = sc.get("score_local8_pps")
        out["kernel_pairs_per_sec_local32"] = sc.get("score_local32_pps")
        out["scaling_efficiency_n_to_4n"] = sc.get("scaling_efficiency_2_to_8")
    # end-to-end N->4N at a data-dominated world size (100k entities, 31M
    # pairs — tools/pipeline_scale_point.py), where the ~280s fixed per-job
    # term no longer swamps the data-parallel work (VERDICT r04 item 3)
    sp_path = os.path.join(here, "BENCH", "pipeline_scale_point.json")
    if os.path.exists(sp_path):
        with open(sp_path) as f:
            sp = json.load(f)
        out["end_to_end_scale_point_entities"] = sp.get("n_entities")
        out["end_to_end_scale_point_pairs"] = sp.get("pairs")
        for k in ("end_to_end_efficiency_2_to_8", "end_to_end_efficiency_8_to_32"):
            if k in sp:
                out[k] = sp[k]
    f1_path = os.path.join(here, "BENCH", "f1_sweep.json")
    if os.path.exists(f1_path):
        with open(f1_path) as f:
            sweep = json.load(f)
        if sweep:
            out["pairwise_f1_min"] = min(r["f1"] for r in sweep)
            out["pairwise_f1_sweep"] = {
                f"n{r['n']}_s{r['seed']}": r["f1"] for r in sweep
            }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

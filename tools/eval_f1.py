"""Run the pipeline on a generated world and report pairwise F1 + timing.

Usage: python tools/eval_f1.py [n_entities] [master] [seed] [mode]

``mode``: "seq" (the sequential generate_world stream — the historical
sweep points), "sharded" (executor-side mapInPandas generation, unlocks
n >= 300k worlds), or "auto" (default: sharded above 100k entities).

Pairwise metrics use the exact closed form over cluster sizes — TP =
sum C(n,2) over (entity, master) cells, FP = predicted-pair total - TP,
FN = actual-pair total - TP — identical to enumerating all conv pairs
(pinned by tests/test_datagen_sharded.py::test_pair_metrics_closed_form)
but O(n) instead of the O(n^2) join that made n=300k infeasible.
"""

import sys
import tempfile
import time

import duckdb

from payor_mdm_spark.datagen.transcripts import generate_world, write_world
from payor_mdm_spark.plans.pipeline import run_pipeline
from payor_mdm_spark.session import get_spark
from payor_mdm_spark.sources.catalog import CheckpointStore

# entities per family in the sharded grid (measured average; sizing only)
ENTITIES_PER_FAMILY = 2.3

PAIR_METRICS_SQL = """
with labeled as (
  select t.conv_id, t.entity_id, x.master_entity_id
  from truth t join xref x on x.source_id = t.conv_id
), cell as (
  select sum(c * (c - 1) / 2) as tp from (
    select count(*) as c from labeled group by entity_id, master_entity_id
  )
), pred as (
  select sum(c * (c - 1) / 2) as pp from (
    select count(*) as c from labeled group by master_entity_id
  )
), act as (
  select sum(c * (c - 1) / 2) as ap from (
    select count(*) as c from labeled group by entity_id
  )
)
select cell.tp, pred.pp - cell.tp as fp, act.ap - cell.tp as fn
from cell, pred, act
"""


def evaluate(n_entities=65, master="local[8]", seed=42, shuffle_partitions=None,
             verbose=True, mode="auto"):
    if shuffle_partitions is None:
        # scale with the world: ~2k entities of pair-work per task keeps
        # task memory flat as n grows (the fixed-16 default OOMed the 8 GiB
        # driver heap at n=300k); floor of 16 preserves the historical
        # sweep configuration at small n
        shuffle_partitions = max(16, n_entities // 2000)
    spark = get_spark(master=master, shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp()
    if mode == "auto":
        mode = "sharded" if n_entities > 100000 else "seq"
    if mode == "sharded":
        from payor_mdm_spark.datagen.transcripts import distributed_world

        n_families = max(1, int(n_entities / ENTITIES_PER_FAMILY))
        turns_df, truth_df = distributed_world(spark, seed, n_families)
        turns_df.write.mode("overwrite").parquet(f"{d}/turns")
        truth_df.write.mode("overwrite").parquet(f"{d}/truth")
        turns = spark.read.parquet(f"{d}/turns")
        gt_glob = f"{d}/truth/*.parquet"
    elif mode == "seq":
        w = generate_world(seed, n_entities)
        tp_path, gt_path = write_world(w, d)
        turns = spark.read.parquet(tp_path)
        gt_glob = gt_path
    else:
        raise ValueError(f"mode must be seq|sharded|auto, got {mode!r}")
    store = CheckpointStore(spark, d + "/ckpt")
    t0 = time.time()
    res = run_pipeline(spark, turns, store)
    elapsed = time.time() - t0
    if verbose:
        print("pipeline secs:", round(elapsed, 1))
        for m in res.metrics:
            print(f"  {m['stage']:>16} rows={m['rows']:>8} {m['seconds']:.2f}s")

    con = duckdb.connect()
    con.execute(f"create view truth as select * from '{gt_glob}'")
    con.execute(f"create view xref as select * from '{d}/ckpt/xref/*.parquet'")
    tp_, fp, fn = con.execute(PAIR_METRICS_SQL).fetchone()
    n_convs = con.execute("select count(*) from truth").fetchone()[0]
    p = tp_ / (tp_ + fp) if tp_ + fp else 0.0
    r = tp_ / (tp_ + fn) if tp_ + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    print(f"mode={mode} convs={n_convs} TP={tp_} FP={fp} FN={fn} "
          f"precision={p:.4f} recall={r:.4f} F1={f1:.4f}")
    return {"f1": f1, "precision": p, "recall": r, "dir": d, "elapsed": elapsed,
            "metrics": res.metrics, "mode": mode, "n_convs": n_convs}


def record_sweep(n: int, seed: int, result: dict,
                 path: str = "BENCH/f1_sweep.json") -> None:
    """Persist one sweep point; tools/bench_scaling.py renders these into
    BENCH/BASELINE.md's F1 section so the sweep survives re-benchmarks."""
    import json
    import os

    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows = [r for r in rows if not (r["n"] == n and r["seed"] == seed)]
    row = {"n": n, "seed": seed,
           "f1": round(result["f1"], 4),
           "precision": round(result["precision"], 4),
           "recall": round(result["recall"], 4)}
    if result.get("mode") == "sharded":
        row["mode"] = "sharded"
        row["n_convs"] = result.get("n_convs")
    rows.append(row)
    rows.sort(key=lambda r: (r["n"], r["seed"]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    m = sys.argv[2] if len(sys.argv) > 2 else "local[8]"
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    mode = sys.argv[4] if len(sys.argv) > 4 else "auto"
    record_sweep(n, s, evaluate(n, m, s, mode=mode))

"""Run the pipeline on a generated world and report pairwise F1 + timing.

Usage: python tools/eval_f1.py [n_entities] [master] [seed]
"""

import sys
import tempfile
import time

import duckdb

from payor_mdm_spark.datagen.transcripts import generate_world, write_world
from payor_mdm_spark.plans.pipeline import run_pipeline
from payor_mdm_spark.session import get_spark
from payor_mdm_spark.sources.catalog import CheckpointStore


def evaluate(n_entities=65, master="local[8]", seed=42, shuffle_partitions=16,
             verbose=True):
    spark = get_spark(master=master, shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp()
    w = generate_world(seed, n_entities)
    tp_path, gt_path = write_world(w, d)
    turns = spark.read.parquet(tp_path)
    store = CheckpointStore(spark, d + "/ckpt")
    t0 = time.time()
    res = run_pipeline(spark, turns, store)
    elapsed = time.time() - t0
    if verbose:
        print("pipeline secs:", round(elapsed, 1))
        for m in res.metrics:
            print(f"  {m['stage']:>16} rows={m['rows']:>8} {m['seconds']:.2f}s")

    con = duckdb.connect()
    con.execute(f"create view truth as select * from '{gt_path}'")
    con.execute(f"create view xref as select * from '{d}/ckpt/xref/*.parquet'")
    tp_, fp, fn = con.execute(
        """
        with labeled as (
          select t.conv_id, t.entity_id, x.master_entity_id
          from truth t join xref x on x.source_id = t.conv_id
        ), pairs as (
          select a.entity_id = b.entity_id as actual,
                 a.master_entity_id = b.master_entity_id as predicted
          from labeled a join labeled b on a.conv_id < b.conv_id
        )
        select sum(case when actual and predicted then 1 else 0 end),
               sum(case when not actual and predicted then 1 else 0 end),
               sum(case when actual and not predicted then 1 else 0 end)
        from pairs
        """
    ).fetchone()
    p = tp_ / (tp_ + fp) if tp_ + fp else 0.0
    r = tp_ / (tp_ + fn) if tp_ + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    print(f"TP={tp_} FP={fp} FN={fn} precision={p:.4f} recall={r:.4f} F1={f1:.4f}")
    return {"f1": f1, "precision": p, "recall": r, "dir": d, "elapsed": elapsed,
            "metrics": res.metrics}


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
    rows.append({"n": n, "seed": seed,
                 "f1": round(result["f1"], 4),
                 "precision": round(result["precision"], 4),
                 "recall": round(result["recall"], 4)})
    rows.sort(key=lambda r: (r["n"], r["seed"]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    m = sys.argv[2] if len(sys.argv) > 2 else "local[8]"
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    record_sweep(n, s, evaluate(n, m, s))

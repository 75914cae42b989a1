"""Scaling-efficiency evidence: same job at local[8] vs local[32].

BASELINE.json north_rule demands >= 0.8 throughput scaling efficiency from
N to 4N executors. No real cluster exists in this sandbox, so (per the task
directive) we run the identical ER pipeline on the identical input at two
parallelism levels and report throughput at both plus
efficiency = (T_8 / T_32) / 4 (equivalently throughput ratio / 4).

Each run is a fresh JVM (subprocess) so the two measurements don't share a
SparkContext. Results land in BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_entities] [runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUN_SNIPPET = r"""
import json, sys, tempfile, time, os
sys.path.insert(0, "/root/repo")
from payor_mdm_spark.datagen.transcripts import generate_world, write_world
from payor_mdm_spark.plans.pipeline import run_pipeline
from payor_mdm_spark.session import get_spark
from payor_mdm_spark.sources.catalog import CheckpointStore

cpus = int(sys.argv[1])
n_entities = int(sys.argv[2])
turns_path = sys.argv[3]

spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 16))
spark.sparkContext.setLogLevel("ERROR")
turns = spark.read.parquet(turns_path)
turns.count()  # warm the scan
d = tempfile.mkdtemp(prefix=f"scale{cpus}_")
store = CheckpointStore(spark, os.path.join(d, "ckpt"))
t0 = time.time()
res = run_pipeline(spark, turns, store, collect_metrics=False)
pairs = res.tables["scored_pairs"].count()
total = time.time() - t0
print(json.dumps({"cpus": cpus, "seconds": round(total, 2), "pairs": pairs,
                  "pairs_per_sec": round(pairs / total, 1)}))
spark.stop()
"""


def run_once(cpus: int, n_entities: int, turns_path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, str(cpus), str(n_entities), turns_path],
        capture_output=True, text=True, timeout=3600,
        cwd="/root/repo",
    )
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"run at local[{cpus}] failed")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import tempfile

    sys.path.insert(0, "/root/repo")
    from payor_mdm_spark.datagen.transcripts import generate_world, write_world

    world = generate_world(seed=42, n_entities=n_entities)
    d = tempfile.mkdtemp(prefix="scaling_world_")
    turns_path, _ = write_world(world, d)
    print(f"world: {n_entities} entities, {len(world.turns)} turns", file=sys.stderr)

    results = {8: [], 32: []}
    for _ in range(runs):
        for cpus in (8, 32):
            r = run_once(cpus, n_entities, turns_path)
            results[cpus].append(r)
            print(f"local[{cpus}]: {r['seconds']}s, {r['pairs_per_sec']} pairs/s",
                  file=sys.stderr)

    best8 = min(results[8], key=lambda r: r["seconds"])
    best32 = min(results[32], key=lambda r: r["seconds"])
    speedup = best8["seconds"] / best32["seconds"]
    efficiency = speedup / 4.0
    summary = {
        "n_entities": n_entities,
        "turns": len(world.turns),
        "pairs_scored": best8["pairs"],
        "local8_sec": best8["seconds"],
        "local8_pairs_per_sec": best8["pairs_per_sec"],
        "local32_sec": best32["seconds"],
        "local32_pairs_per_sec": best32["pairs_per_sec"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary))

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured results

## Scaling efficiency (north_rule: >= 0.8 from N to 4N cores)

No real cluster exists in this sandbox, so the cluster-size criterion is
evidenced by running the SAME ER pipeline job on the SAME input (seed-42
world, {n_entities} entities / {len(world.turns)} turns,
{best8['pairs']} candidate pairs scored) at two parallelism levels in
separate JVMs:

| config | wall time (s) | pairs scored/sec |
| --- | --- | --- |
| local[8]  | {best8['seconds']} | {best8['pairs_per_sec']} |
| local[32] | {best32['seconds']} | {best32['pairs_per_sec']} |

* speedup 8 -> 32 cores (4x): **{summary['speedup_8_to_32']}x**
* scaling efficiency = speedup / 4 = **{summary['scaling_efficiency']}**

Note: local-mode scaling under-states cluster scaling — all {len(world.turns)}
turns' shuffle blocks share one JVM heap, the driver runs on the same cores,
and several pipeline stages are fixed-latency Spark job overhead
(per-stage checkpoint commits, label-propagation iterations) that does not
shrink with cores. The per-stage breakdown in BENCH_r*.json separates the
scan/score stages (which scale with cores) from the fixed-latency stages.

## Headline throughput

See BENCH_r*.json (driver-recorded, `bench.py` at sf0.1 / local[32]):
primary metric `pairs_scored_per_sec` (candidate-pairs-scored/sec through
the DET-split + Arrow-vectorized ensemble kernel, including the checkpoint
write).
""")
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()

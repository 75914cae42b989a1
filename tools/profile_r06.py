"""Round-6 measurement harness (guide §1): time each headline query in
isolation with the SAME methodology as the frozen bench (.count()), plus a
noop-sink sample, and dump .explain("formatted") to plans/r06/.

Usage:
  python tools/profile_r06.py [--sf-dir /root/testdata/sf1.0] [--tag before]
      [--queries q1,q2,...] [--reps 2] [--noop]

Writes plans/r06/<query>_<tag>.txt and prints one JSON line with timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DEFAULT_QUERIES = [
    "tpch_q1_pricing_summary",
    "blocking_pairs_two_keys",
    "score_jaro_winkler",
    "connected_components",
    "survivorship_rules",
    "dedup_minhash_lsh_prod",   # bench's production xxhash64 configuration
    "dedup_minhash_lsh",        # md5 oracle mode (timed by frozen bench too)
    "ann_brute_force_topk",
    "text_token_stats",
    "events_sessionize",
    "dup_span_signals_token",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink write")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from payor_mdm_spark.plans.testdata_queries import Q
    from payor_mdm_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = (
        {"spark.local.dir": "/dev/shm/bench_spark_local"}
        if os.path.isdir("/dev/shm") else {}
    )
    spark = get_spark(
        app_name="profile-r06",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_confs=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench as bench_mod  # run_minhash_production

    def get_fn(name):
        if name == "dedup_minhash_lsh_prod":
            return bench_mod.run_minhash_production
        return Q[name]

    plans_dir = os.path.join(HERE, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict = {"sf_dir": args.sf_dir, "cpus": cpus, "tag": args.tag, "queries": {}}
    for name in [q.strip() for q in args.queries.split(",") if q.strip()]:
        fn = get_fn(name)
        if not args.no_plans:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} count rep{r}")
            t0 = time.time()
            n = fn(spark, args.sf_dir).count()
            samples.append(round(time.time() - t0, 3))
        rec = {"rows": n, "count_samples": samples, "count_min": min(samples)}
        if args.noop:
            spark.sparkContext.setJobDescription(f"{name} noop")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            rec["noop_sec"] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        out["queries"][name] = rec
        print(f"{name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Summarize BENCH/scaling_samples.jsonl into best-of-K efficiencies.

Prints per-config sample count, best/median throughput, and every N->4N
pair's best-of efficiency ((best pps at 4N) / (best pps at N) / 4). Also
emits a JSON summary for BENCH/scaling.json merging.

Usage: python tools/analyze_scaling_samples.py
"""

from __future__ import annotations

import json
import statistics

PATH = "/root/repo/BENCH/scaling_samples.jsonl"


def main() -> None:
    by_cpus: dict[int, list[float]] = {}
    with open(PATH) as f:
        for line in f:
            r = json.loads(line)
            by_cpus.setdefault(r["cpus"], []).append(r["pairs_per_sec"])
    summary = {}
    for cpus in sorted(by_cpus):
        v = by_cpus[cpus]
        summary[cpus] = {
            "samples": len(v),
            "best_pps": max(v),
            "median_pps": statistics.median(v),
            "worst_pps": min(v),
        }
        print(f"local[{cpus:2d}]: n={len(v):2d} best={max(v):>9,.0f} "
              f"median={statistics.median(v):>9,.0f} worst={min(v):>9,.0f}")
    pairs = [(1, 4), (2, 8), (8, 32)]
    effs = {}
    for n, n4 in pairs:
        if n in summary and n4 in summary:
            e = summary[n4]["best_pps"] / summary[n]["best_pps"] / 4.0
            em = summary[n4]["median_pps"] / summary[n]["median_pps"] / 4.0
            effs[f"{n}_to_{n4}"] = {"best_of": round(e, 3),
                                    "median_of": round(em, 3)}
            print(f"N->4N local[{n}]->local[{n4}]: best-of eff={e:.3f} "
                  f"median-of eff={em:.3f}")
    print(json.dumps({"configs": summary, "efficiency": effs}))


if __name__ == "__main__":
    main()

"""Summarize BENCH/scaling_samples.jsonl into best-of-K efficiencies.

Prints per-config sample count, best/median throughput, and every N->4N
pair's best-of efficiency ((best pps at 4N) / (best pps at N) / 4). Also
emits a JSON summary for BENCH/scaling.json merging.

ADVICE r04: efficiency is only computed between samples measured on the
SAME input size — pre-r5 samples ran the small configs on 1/4 the pairs,
which lets the small-N arm amortize fixed per-job cost over fewer pairs
and biases the ratio; those legacy cross-size pairings are excluded
rather than silently mixed in.

Usage: python tools/analyze_scaling_samples.py
"""

from __future__ import annotations

import json
import statistics

PATH = "/root/repo/BENCH/scaling_samples.jsonl"


def main() -> None:
    by_key: dict[tuple[int, int], list[float]] = {}
    with open(PATH) as f:
        for line in f:
            r = json.loads(line)
            by_key.setdefault((r["cpus"], r["pairs"]), []).append(
                r["pairs_per_sec"]
            )
    summary: dict[str, dict] = {}
    for (cpus, pairs) in sorted(by_key):
        v = by_key[(cpus, pairs)]
        summary[f"{cpus}@{pairs}"] = {
            "cpus": cpus,
            "pairs": pairs,
            "samples": len(v),
            "best_pps": max(v),
            "median_pps": statistics.median(v),
            "worst_pps": min(v),
        }
        print(
            f"local[{cpus:2d}] @{pairs:>9,} pairs: n={len(v):2d} "
            f"best={max(v):>9,.0f} median={statistics.median(v):>9,.0f} "
            f"worst={min(v):>9,.0f}"
        )
    effs = {}
    for n, n4 in [(1, 4), (2, 8), (8, 32)]:
        # same-input pairings only (ADVICE r04)
        shared = sorted(
            p for (c, p) in by_key if c == n
            if (n4, p) in by_key
        )
        for p in shared:
            lo, hi = by_key[(n, p)], by_key[(n4, p)]
            e = max(hi) / max(lo) / 4.0
            em = statistics.median(hi) / statistics.median(lo) / 4.0
            effs[f"{n}_to_{n4}@{p}"] = {
                "pairs": p,
                "best_of": round(e, 3),
                "median_of": round(em, 3),
            }
            print(
                f"N->4N local[{n}]->local[{n4}] @{p:,} pairs (same input): "
                f"best-of eff={e:.3f} median-of eff={em:.3f}"
            )
        if not shared:
            print(
                f"N->4N local[{n}]->local[{n4}]: no same-input samples — "
                "skipped (legacy cross-size samples are not comparable)"
            )
    print(json.dumps({"configs": summary, "efficiency": effs}))


if __name__ == "__main__":
    main()

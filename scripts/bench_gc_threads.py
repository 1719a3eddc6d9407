"""A/B ParallelGCThreads on the flagship at local[16].

Hypothesis (round 5): ParallelGC sizes its stop-the-world worker pool
from the ADVERTISED 32 vCPUs (5/8·32 ≈ 23 threads), but the host
delivers only ~17.4 cores (`scripts/cpu_capacity_probe.py`) — so
during every young-gen pause, 23 GC threads + the JVM's service
threads momentarily exceed the delivered capacity and the pause
stretches. Capping the pool near the DELIVERED core count should
shorten pauses at local[16] and be neutral at local[4].

Same flagship job + protocol as scripts/bench_storm_harness.py (one
JVM per config, 2 warm-ups, min of the remaining reps, loadavg and
CPU-steal recorded per rep for storm attribution).

Usage:
    python scripts/bench_gc_threads.py [--cpus 16] [--reps 5]
        [--threads 23 17 13 8]

Prints one JSON line per config and a final summary.
"""

from __future__ import annotations

import argparse
import json

from bench_storm_harness import run_level


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--threads", type=int, nargs="+", default=[0, 17, 13, 8],
                    help="ParallelGCThreads values; 0 = JVM default (~23 here)")
    args = ap.parse_args()

    results = {}
    for n in args.threads:
        extra = "" if n == 0 else f" -XX:ParallelGCThreads={n}"
        rec = run_level(args.cpus, args.reps, gc_extra=extra)
        results[str(n) or "default"] = rec
        print(json.dumps({"gc_threads": n or "default", **rec}), flush=True)

    best = min(results.items(), key=lambda kv: kv[1]["best"])
    print(json.dumps({
        "summary": {k: v["best"] for k, v in results.items()},
        "winner": best[0],
        "winner_best_sec": best[1]["best"],
    }))


if __name__ == "__main__":
    main()

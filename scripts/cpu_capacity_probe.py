"""Host CPU capacity probe: does this guest actually get N vCPUs of
compute when N threads spin?

The guest reports 32 physical cores (lscpu: 32 cores, 1 thread/core,
1 socket), yet in-box 4→16 Spark scaling lands well under 0.8 while
2→8 sits at ~0.92 and the DRAM probe (`bw_probe.py`) is flat. A
HOST-side vCPU overcommit would produce exactly that signature: levels
whose own threads + JVM/Python service threads fit inside the host's
real allocation scale cleanly; levels that exceed it stall in steal
time, invisibly to the guest except as wall-clock.

Method: N worker PROCESSES (no GIL) each run an identical fixed
numpy integer workload in a loop for a fixed wall window; aggregate
iterations/sec vs N is the guest's delivered compute curve. On real
dedicated cores the per-worker rate holds flat until N = cores. The
probe also samples /proc/stat steal time around each level when the
hypervisor exposes it.

Usage: python scripts/cpu_capacity_probe.py [levels...] (default
1 2 4 8 12 16 20 24 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _spin(stop_at: float, out):
    import numpy as np

    x = np.arange(200_000, dtype=np.int64)
    it = 0
    while time.perf_counter() < stop_at:
        # integer multiply-xor chain: core-bound, cache-resident
        x = (x * 1103515245 + 12345) ^ (x >> 7)
        it += 1
    out.put(it)


def _steal() -> int | None:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else None  # steal jiffies
    except Exception:
        return None


def run_level(n: int, seconds: float = 8.0) -> dict:
    q = mp.Queue()
    stop_at = time.perf_counter() + seconds
    s0 = _steal()
    procs = [mp.Process(target=_spin, args=(stop_at, q)) for _ in range(n)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    iters = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    s1 = _steal()
    total = sum(iters)
    return {
        "n": n,
        "iters_total": total,
        "iters_per_worker": round(total / n),
        "rate_total": round(total / wall, 1),
        "steal_jiffies": None if s0 is None or s1 is None else s1 - s0,
        "load1_after": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 12, 16, 20, 24, 32]
    out = [run_level(n) for n in levels]
    base = out[0]["iters_per_worker"]
    for r in out:
        r["per_worker_vs_1"] = round(r["iters_per_worker"] / base, 3)
    print(json.dumps({"levels": out}))
    # headline: delivered parallel capacity = rate_total(N)/rate_total(1)
    r1 = out[0]["rate_total"]
    caps = {r["n"]: round(r["rate_total"] / r1, 2) for r in out}
    print("delivered parallel capacity (xN vs 1 worker):", caps)


if __name__ == "__main__":
    main()

"""Two-parallelism scaling evidence (the sandbox proxy for the north
rule's N → 4N executor efficiency): run the identical bench job at
local[8] and local[32] on the same input, ≥3 timed runs each after a
warm-up, and report median throughput + scaling efficiency into
BENCH/BASELINE.md.

efficiency = T_8 / T_32 / 4  (i.e. speedup(32 vs 8) / 4) — per-core
work conservation between the two cluster sizes.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = int(os.environ.get("SCALING_RUNS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results: dict[int, list[dict]] = {}
    for cpus in (8, 32):
        runs = []
        for i in range(RUNS + 1):  # first run is the warm-up (JVM + page cache)
            r = run_bench(cpus)
            if i > 0:
                runs.append(r)
            print(f"local[{cpus}] run{i}: pipeline={r['queries']['scene_pipeline']}s "
                  f"({r['throughput_docs_per_sec']} docs/s)", flush=True)
        results[cpus] = runs

    def med(cpus: int, key: str) -> float:
        return statistics.median(r["queries"]["scene_pipeline"] for r in results[cpus])

    t8 = med(8, "scene_pipeline")
    t32 = med(32, "scene_pipeline")
    n_docs = results[8][0]["n_docs"]
    thr8 = n_docs / t8
    thr32 = n_docs / t32
    eff = (t8 / t32) / 4.0
    md = f"""# BENCH/BASELINE — measured numbers

Flagship job: interleaved-documents parquet scan → span parse →
scene catalog → AOI+date+polarization select (bbox prefilter + exact
polygon refine) → HGT tile-lattice assignment → tile counts.
Input: deterministic synthetic table, seed=42, {n_docs} docs
(sf from {SF_DIR}). Protocol: 1 warm-up run excluded, median of
{RUNS} timed runs per parallelism level, single machine, identical
input — the sandbox proxy for N → 4N executors.

| parallelism | median pipeline sec | docs/sec |
|---|---|---|
| local[8]  | {t8:.2f} | {thr8:,.0f} |
| local[32] | {t32:.2f} | {thr32:,.0f} |

**Scaling efficiency (8 → 32 cores): {eff:.3f}** (target ≥ 0.8;
efficiency = speedup / 4).

Raw per-run JSON:

```json
{json.dumps({str(k): v for k, v in results.items()}, indent=1)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md.split("```")[0])


if __name__ == "__main__":
    main()

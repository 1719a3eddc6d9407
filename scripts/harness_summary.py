"""Summarize storm-harness logs (BENCH/storm_harness_*.jsonl).

One row per cycle: efficiency, quiet verdict and the gate readings
behind it — so the round's scaling record can be tabulated without
re-deriving anything from raw JSON. Used to build the BENCH/BASELINE.md
scaling tables.

Usage: python scripts/harness_summary.py [logs...]
(default: every BENCH/storm_harness_*.jsonl in the repo)
"""

from __future__ import annotations

import glob
import json
import os
import sys


def summarize(path: str) -> None:
    cycles = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                cycles.append(json.loads(line))
    print(f"\n== {os.path.basename(path)} ({len(cycles)} cycles)")
    quiet_effs = []
    for c in cycles:
        if "failed" in c:
            print(f"  cycle {c['cycle']}: FAILED ({c['failed'][:80]}...)")
            continue
        if "eff_2_8" in c and "l4" not in c:
            print(f"  cycle {c['cycle']}: 2->8 proxy only = {c['eff_2_8']}"
                  f" (quiet={c.get('proxy_quiet')})")
            continue
        l4, l16 = c["l4"], c["l16"]
        eff = c["eff_4_16"]
        quiet = c.get("pair_quiet")
        extra = ""
        if "eff_2_8" in c:
            extra = f" eff_2_8={c['eff_2_8']} proxy_quiet={c.get('proxy_quiet')}"
        print(
            f"  cycle {c['cycle']}: eff={eff} quiet={quiet} "
            f"l4={l4['best']}s(base {l4['baseline_load']}, steal "
            f"{l4.get('max_steal_cps')}) l16={l16['best']}s(base "
            f"{l16['baseline_load']}, steal {l16.get('max_steal_cps')})"
            + extra
        )
        if quiet:
            quiet_effs.append(eff)
    if quiet_effs:
        print(
            f"  quiet pairs: {len(quiet_effs)}  effs={quiet_effs}  "
            f"best={max(quiet_effs)}  mean={round(sum(quiet_effs)/len(quiet_effs), 3)}"
        )
    else:
        print("  quiet pairs: 0")


def main() -> None:
    paths = sys.argv[1:] or sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "BENCH", "storm_harness_*.jsonl"))
    )
    for p in paths:
        summarize(p)


if __name__ == "__main__":
    main()

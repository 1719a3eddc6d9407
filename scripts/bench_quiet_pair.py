"""Focused quiet-window 4 ↔ 16 pair (pipeline only, no ingest write):
the full sweep's top level is the one most exposed to this VM's
exogenous load storms, so the in-box 4→16 number is re-measured here
with more reps and no disk stage, to be read NEXT TO the system load
(printed per rep). Usage: python scripts/bench_quiet_pair.py [reps]."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 16_000_000
DOCS = f"/tmp/pyrosar_scaling_docs_{N_DOCS}"

SCRIPT = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from pyrosar_spark.operators.ingest import docs_to_scenes
from pyrosar_spark.operators.select import select
from pyrosar_spark.operators.tiles import assign_hgt
sel = select(docs_to_scenes(spark.read.parquet({docs!r}), with_geometry="defer",
             columns=["doc_id", "start", "stop", "vv", "corners", "xmin", "xmax", "ymin", "ymax"]),
             mindate="20150101T000000", maxdate="20151231T235959", polarizations=["VV"],
             aoi_wkt="POLYGON((-180 -60, -60 -60, -60 60, -180 60, -180 -60))",
             return_value=["doc_id", "xmin", "xmax", "ymin", "ymax"])
df = assign_hgt(sel).groupBy("tile_id").count()
times = []
for i in range({reps}):
    t0 = time.perf_counter(); df.count(); dt = time.perf_counter() - t0
    times.append(dt)
    print(f"rep{{i}}: {{dt:.2f}}s load1={{os.getloadavg()[0]:.1f}}", file=sys.stderr, flush=True)
print(json.dumps(times))
"""


def run(cpus: int, reps: int) -> list[float]:
    path = f"/tmp/quiet_pair_{cpus}.py"
    with open(path, "w") as f:
        f.write(SCRIPT.format(repo=REPO, docs=DOCS, reps=reps))
    out = subprocess.run(
        ["spark-submit", "--master", f"local[{cpus}]", "--driver-memory", "24g",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.ui.showConsoleProgress=false",
         "--conf", f"spark.sql.shuffle.partitions={cpus * 4}",
         "--conf", "spark.sql.adaptive.enabled=true",
         "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--conf", "spark.sql.files.maxPartitionBytes=33554432",
         "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
         path],
        capture_output=True, text=True, check=True,
    )
    for line in out.stderr.splitlines():
        if line.startswith("rep"):
            print(f"local[{cpus}] {line}")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("[")][-1])


def main() -> None:
    # first 2 reps are warm-up and excluded from the min — need >= 3
    reps = max(int(sys.argv[1]) if len(sys.argv) > 1 else 9, 3)
    t4 = run(4, reps)
    t16 = run(16, reps)
    b4, b16 = min(t4[2:]), min(t16[2:])
    print(json.dumps({
        "level4": t4, "level16": t16, "best4": round(b4, 2),
        "best16": round(b16, 2), "eff_4_16": round(b4 / b16 / 4, 3),
    }))


if __name__ == "__main__":
    main()

"""A/B bench: Arrow simhash kernel vs the interpreted JVM HOF form
(VERDICT r2 #3 evidence). Same input (sf documents.parquet text),
same md5-portable output; measures the wall time of computing the
64-bit simhash column for every document, min of N reps per kernel.

Usage: python scripts/bench_simhash.py [sf_dir] [reps]
Prints one JSON line with both timings and the speedup.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pyrosar_spark.operators.dedup import simhash64, simhash64_udf  # noqa: E402
from pyrosar_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench_simhash", cpus=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = docs.repartition(16).persist()
    n = docs.count()

    def time_kernel(col) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            # xor-agg forces full evaluation of every hash, one action
            docs.select(F.bit_xor(col).alias("s")).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    arrow_col = simhash64_udf()(F.col("text"))
    hof_col = simhash64(F.col("text"), "md5")
    # warm-up both paths once (JIT + python worker spin-up)
    docs.select(F.bit_xor(arrow_col)).collect()
    t_arrow = time_kernel(arrow_col)
    docs.select(F.bit_xor(hof_col)).collect()
    t_hof = time_kernel(hof_col)
    print(
        json.dumps(
            {
                "n_docs": n,
                "sf_dir": sf_dir,
                "reps": reps,
                "arrow_sec": round(t_arrow, 3),
                "hof_sec": round(t_hof, 3),
                "speedup": round(t_hof / t_arrow, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

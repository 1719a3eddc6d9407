"""A/B the catalog JSON parse kernels (round-4 #1: the round-3 scaling
decomposition named the Jackson ``from_json`` allocation pressure as the
remaining 4→16 in-box term — this measures the ``json_tuple`` one-pass
alternative against it on the flagship shape).

Usage: python scripts/bench_parse.py [n_docs] [cpus] [reps]
Prints per-parser min/spread for (a) the flagship pruned projection and
(b) the full 17-field catalog build, plus a row-level parity check.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pyrosar_spark.datagen import generate_documents  # noqa: E402
from pyrosar_spark.operators.ingest import docs_to_scenes  # noqa: E402
from pyrosar_spark.session import get_spark  # noqa: E402

FLAGSHIP_COLS = [
    "doc_id", "start", "stop", "vv", "corners", "xmin", "xmax", "ymin", "ymax",
]


def force(df) -> int:
    # bit_xor over a hash of every column forces full evaluation without
    # bigint-sum ANSI overflow (memory: F.sum over 60-bit hashes overflows)
    return df.select(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h")
    ).collect()[0][0]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bench_parse", cpus=cpus)

    docs_path = f"/tmp/pyrosar_bench_docs_{n_docs}_s42"
    import os

    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        generate_documents(spark, n_docs, seed=42, n_partitions=cpus * 4).write.mode(
            "overwrite"
        ).parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    # parity at small scale first (hash over full catalog columns,
    # ALL three kernels — the docstring's equivalence claim is only as
    # good as this check)
    small = generate_documents(spark, 20_000, seed=7)
    hashes = {
        p: force(docs_to_scenes(small, with_geometry=False, parser=p))
        for p in ("from_json", "json_tuple", "get_json_object")
    }
    ok = len(set(hashes.values())) == 1
    print(f"parity full-catalog 20k docs: {hashes} {'OK' if ok else 'MISMATCH'}")
    if not ok:
        raise SystemExit("parser kernels disagree — fix before benchmarking")

    shapes = {
        "flagship9": dict(with_geometry="defer", columns=FLAGSHIP_COLS),
        "full17": dict(with_geometry=False),
    }
    for shape, kw in shapes.items():
        for parser in ("from_json", "json_tuple", "get_json_object"):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                force(docs_to_scenes(docs, parser=parser, **kw))
                ts.append(time.perf_counter() - t0)
            print(
                f"{shape:10s} {parser:10s} min={min(ts):7.3f}s "
                f"spread={max(ts) - min(ts):6.3f}s reps={[round(t, 2) for t in ts]}"
            )


if __name__ == "__main__":
    main()

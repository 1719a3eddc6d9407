"""ANN approximation QUALITY: recall@k vs the exact brute-force path.

The contract oracles (`ann_lsh`, `ann_ivf`) prove the Spark plans
compute their bucketed semantics EXACTLY (the DuckDB SQL reproduces the
same buckets), but say nothing about how good the approximation is —
an ANN that returns the wrong neighbors with perfect internal
consistency would still pass. This script closes that gap: ground
truth = `cosine_topk` (exact, brute force), candidates = `lsh_topk` /
`ivf_topk` across a small config sweep, metric = mean recall@k per
query (|approx ∩ exact| / k).

Two structural invariants are also checked (and unit-pinned in
tests/test_ann_recall.py):
 - IVF probing ALL cells degenerates to the exact brute force
   (recall 1.0 by construction — candidate set is every item);
 - recall rises monotonically with n_probe / n_tables on this seeded
   data (the quality dial actually dials).

Usage:
    spark-submit scripts/ann_recall.py [sf_dir] [k]

Prints one JSON line:
    {"k": 10, "n_queries": ..., "lsh": {"T1": r, "T2": r, "T4": r},
     "ivf": {"p1": r, "p2": r, "p4": r, "pALL": r}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pyrosar_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk

N_CELLS = 16


def recall_at_k(exact, approx, k: int) -> float:
    """Mean per-query |approx ∩ exact| / k (both already rank<=k)."""
    e = exact.select("q_id", "item_id")
    a = approx.select("q_id", "item_id")
    n_q = e.select("q_id").distinct().count()
    hits = e.join(a, ["q_id", "item_id"]).count()
    return round(hits / (n_q * k), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = SparkSession.builder.master("local[8]").config(
        "spark.sql.shuffle.partitions", "16"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    queries = emb.orderBy("vec_id").limit(20).cache()
    exact = cosine_topk(emb, queries, k=k).cache()
    exact.count()

    out = {"k": k, "n_queries": queries.count(), "sf_dir": sf_dir,
           "lsh": {}, "ivf": {}}
    # bucket-occupancy note: recall collapses when 2^n_bits ≫ n_items /
    # (items-per-bucket needed) — 8 bits over 500 vectors leaves ~2
    # candidates per probe. Sweep bits × tables to expose the dial.
    for n_bits in (2, 4, 6, 8):
        for n_tables in (1, 2, 4):
            approx = lsh_topk(emb, queries, k=k, n_bits=n_bits,
                              n_tables=n_tables, dim=64)
            out["lsh"][f"b{n_bits}T{n_tables}"] = recall_at_k(exact, approx, k)
    for n_probe in (1, 2, 4, N_CELLS):
        approx = ivf_topk(emb, queries, k=k, n_cells=N_CELLS, n_probe=n_probe)
        key = "pALL" if n_probe == N_CELLS else f"p{n_probe}"
        out["ivf"][key] = recall_at_k(exact, approx, k)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Plan-size / analysis-time A/B for the ANN constant plumbing
(VERDICT r3 #3 done-criterion): literal expression trees (n_bits ×
n_tables × dim scalar ``F.lit``\\ s) vs the broadcast one-row constant
column (``with_const``), at production-ish configs n_bits=32,
n_tables=4 and n_cells=256, dim=64.

Prints, per variant: wall time to build+analyze the plan and the
length of ``queryExecution().toString()``.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pyrosar_spark.operators.similarity import (  # noqa: E402
    _hyperplane,
    _planes3,
    _PLANES3_T,
    cosine,
    lsh_bucket,
    lsh_bucket_col,
    with_const,
    _as_double,
)
from pyrosar_spark.session import get_spark  # noqa: E402


def measure(name: str, build) -> None:
    t0 = time.perf_counter()
    df = build()
    df.schema  # force analysis
    qe_len = len(df._jdf.queryExecution().toString())
    dt = time.perf_counter() - t0
    print(f"{name:28s} analyze={dt:7.3f}s plan_chars={qe_len:,}")


def main() -> None:
    spark = get_spark("plan_size_ann", cpus=4)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    it = emb.select(
        F.col("vec_id").alias("_id"), _as_double(F.col("embedding")).alias("_vec")
    )
    n_bits, n_tables, dim, seed = 32, 4, 64, 42
    planes3 = _planes3(n_bits, n_tables, dim, seed)

    def literal_buckets():
        buckets = F.array(
            *[lsh_bucket(F.col("_vec"), planes3[t]) for t in range(n_tables)]
        )
        return it.withColumn("_bkts", buckets).select(
            "_id", F.posexplode("_bkts").alias("_table", "_bucket")
        )

    def broadcast_buckets():
        out = with_const(it, "_planes", planes3, _PLANES3_T)
        return out.withColumn(
            "_bkts",
            F.transform(F.col("_planes"), lambda tp: lsh_bucket_col(F.col("_vec"), tp)),
        ).select("_id", F.posexplode("_bkts").alias("_table", "_bucket"))

    measure("lsh literal  (32x4x64)", literal_buckets)
    measure("lsh broadcast(32x4x64)", broadcast_buckets)

    # value parity: identical buckets under both forms
    a = literal_buckets().orderBy("_id", "_table").collect()
    b = broadcast_buckets().orderBy("_id", "_table").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "bucket mismatch"
    print("bucket parity over", len(a), "rows: OK")

    n_cells = 256
    cents = [(i, _hyperplane(dim, i, 7)) for i in range(n_cells)]
    cents_t = "array<struct<cell:bigint,vec:array<double>>>"

    def literal_cells():
        scored = F.array(
            *[
                F.struct(
                    (-cosine(F.col("_vec"), F.array(*[F.lit(x) for x in cv]))).alias("d"),
                    F.lit(ci).alias("cell"),
                )
                for ci, cv in cents
            ]
        )
        return it.withColumn("_cell", F.element_at(F.array_sort(scored), 1).cell)

    def broadcast_cells():
        out = with_const(it, "_cents", cents, cents_t)
        scored = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                (-cosine(F.col("_vec"), c["vec"])).alias("d"), c["cell"].alias("cell")
            ),
        )
        return out.withColumn(
            "_cell", F.element_at(F.array_sort(scored), 1).cell
        ).drop("_cents")

    measure("ivf literal  (256x64)", literal_cells)
    measure("ivf broadcast(256x64)", broadcast_cells)
    a = literal_cells().select("_id", "_cell").orderBy("_id").collect()
    b = broadcast_cells().select("_id", "_cell").orderBy("_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "cell mismatch"
    print("cell parity over", len(a), "rows: OK")


if __name__ == "__main__":
    main()

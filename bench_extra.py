"""Round-6 measurement harness (guide §1) — NOT the driver contract.

Isolates each headline query with the noop sink (and the bench's
``.count()`` form for comparability), labels jobs, captures
``explain('formatted')`` to ``plans/r06/``, and prints per-query
min-of-reps. ``bench.py`` is frozen for measurement; this file exists
so optimization evidence does not touch it.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py \
      [--queries q1,q2] [--reps 3] [--plans before|after|none] \
      [--sink count|noop] [--flagship-ndocs N]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default="none", choices=["before", "after", "none"])
    ap.add_argument("--sink", default="count", choices=["count", "noop"])
    ap.add_argument("--flagship-ndocs", type=int, default=None)
    ap.add_argument("--skip-flagship", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    except ValueError:
        sf = 0.1

    from pyrosar_spark.session import get_spark

    spark = get_spark("pyrosar_bench_extra", cpus=cpus)
    import __spark_entry__ as entry_mod

    plans_dir = "/root/repo/plans/r06"
    os.makedirs(plans_dir, exist_ok=True)

    def run_sink(df):
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    timings: dict[str, list[float]] = {}

    def timed(name: str, build) -> None:
        sc = spark.sparkContext
        ts = []
        for i in range(args.reps):
            sc.setJobDescription(f"r06 {name} rep{i}")
            t0 = time.perf_counter()
            run_sink(build())
            ts.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        timings[name] = ts
        if args.plans != "none":
            with open(f"{plans_dir}/{name}_{args.plans}.txt", "w") as f:
                f.write(build()._sc_explain())

    # attach an explain helper returning the formatted string
    from pyspark.sql import DataFrame

    def _mode(df):
        jvm = df.sparkSession.sparkContext._jvm
        return jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    DataFrame._sc_explain = lambda self: self._jdf.queryExecution().explainString(
        _mode(self)
    )

    qs = entry_mod.queries()
    headline = [
        "pricing_summary", "revenue_join", "topk_per_group", "session_gap",
        "asof_purchase_view", "tile_assign", "near_dup_pairs",
        "dup_ngram_spans", "cosine_topk", "scene_spatial_join", "scene_knn",
    ]
    if args.queries is not None:
        wanted = {q.strip() for q in args.queries.split(",") if q.strip()}
        headline = [h for h in headline if h in wanted]
        do_flagship = "scene_pipeline" in wanted
    else:
        do_flagship = not args.skip_flagship

    if do_flagship:
        from pyrosar_spark.datagen import generate_documents
        from pyrosar_spark.operators.ingest import docs_to_scenes
        from pyrosar_spark.operators.select import select
        from pyrosar_spark.operators.tiles import assign_hgt

        n_docs = args.flagship_ndocs or max(int(sf * 2_000_000), 10_000)
        docs_path = f"/tmp/pyrosar_bench_docs_{n_docs}_s42"
        if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
            generate_documents(spark, n_docs, seed=42, n_partitions=cpus * 4).write.mode(
                "overwrite"
            ).parquet(docs_path)

        def flagship_df():
            docs = spark.read.parquet(docs_path)
            scenes = docs_to_scenes(
                docs, with_geometry="defer",
                columns=["doc_id", "start", "stop", "vv", "corners",
                         "xmin", "xmax", "ymin", "ymax"],
            )
            sel = select(
                scenes,
                mindate="20150101T000000",
                maxdate="20151231T235959",
                polarizations=["VV"],
                aoi_wkt="POLYGON((-180 -60, -60 -60, -60 60, -180 60, -180 -60))",
                return_value=["doc_id", "xmin", "xmax", "ymin", "ymax"],
            )
            return assign_hgt(sel).groupBy("tile_id").count()

        # warm-up identical to bench.py
        docs_to_scenes(generate_documents(spark, 2_000, seed=42)).count()
        spark.sparkContext.setJobDescription("r06 flagship warmup")
        t0 = time.perf_counter()
        flagship_df().count()
        warm = round(time.perf_counter() - t0, 3)

        def flagship_build():
            return flagship_df()

        timed("scene_pipeline", flagship_build)
        timings["_flagship_warmup"] = [warm]

    for name in headline:
        timed(name, lambda n=name: qs[n](spark, sf_dir))

    out = {
        "sf": sf,
        "cpus": cpus,
        "sink": args.sink,
        "mins": {k: min(v) for k, v in timings.items()},
        "reps": timings,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

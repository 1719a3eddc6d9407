"""Property-based parity fuzz for the ``select()`` predicate surface
(VERDICT r3 #6): ~100 seeded random kwarg/date/pol/scene combinations,
each evaluated BOTH by the Spark plan builder and by an independently
written DuckDB SQL translation of the reference semantics
(``archive.py:902-1113``); the returned doc_id sets must match exactly.

Locks P1/P2 (eq + IN after string cast), P3 (scene LIKE basename),
P4/P5 (date_strict fully-inside vs overlap), P6 (malformed dates
ignored), P7 (pol flags, unknown pols dropped), P9 (typo kwargs
dropped) and their interactions — beyond the fixed goldens. The AOI
path (P8) is exercised by the driver oracles (scene_spatial_join).
"""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pytest

from pyrosar_spark.operators.select import select

STAMP_RE = re.compile("[0-9]{8}T[0-9]{6}")

SENSORS = ["S1A", "S1B", "PSR2", "NOPE"]
MODES = ["IW", "EW", "FBD", "FBS", "XX"]
PRODUCTS = ["GRD", "SLC", "1.5", "9.9"]
ORBITS = ["A", "D"]
POLS = ["HH", "VV", "HV", "VH", "XX", "vv"]
DATES = [
    # weighted toward in-range stamps so conjunctions still hit rows;
    # the tail keeps P6 (malformed → ignored) and empty-range cases hot
    "20150101T000000", "20150101T000000", "20150610T120000",
    "20150610T120000", "20151231T235959", "20151231T235959",
    "20140101T000000", "20160101T000000",
    "2015-06-10", "junk", "20150610", "",
]


@pytest.fixture(scope="module")
def fuzz_frames(spark):
    from pyrosar_spark.datagen import generate_documents
    from pyrosar_spark.operators.ingest import docs_to_scenes

    docs = generate_documents(spark, 1500, seed=99)
    scenes = docs_to_scenes(docs, with_geometry=False).drop("corners", "ring").cache()
    pdf = scenes.toPandas()
    con = duckdb.connect()
    con.register("scenes", pdf)
    return scenes, con, pdf


def _sql_quote(v) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _eq_or_in_sql(col: str, v) -> str:
    if isinstance(v, (tuple, list)):
        return f"CAST({col} AS VARCHAR) IN ({', '.join(_sql_quote(x) for x in v)})"
    return f"CAST({col} AS VARCHAR) = {_sql_quote(v)}"


def _case(rng: np.random.Generator, sample_scenes) -> tuple[dict, list[str]]:
    """One random select() argument dict + the equivalent SQL WHERE
    clauses, written from the REFERENCE semantics (not from select()'s
    code paths)."""
    args: dict = {}
    preds: list[str] = []

    def pick(options):
        x = options[rng.integers(len(options))]
        if rng.random() < 0.3:
            extra = options[rng.integers(len(options))]
            return [x, extra]
        return x

    for col, options in (("sensor", SENSORS), ("product", PRODUCTS),
                         ("acquisition_mode", MODES)):
        if rng.random() < 0.4:
            v = pick(options)
            args[col] = v
            preds.append(_eq_or_in_sql(col, v))
    if rng.random() < 0.4:
        v = pick(ORBITS)
        args["orbit"] = v
        preds.append(_eq_or_in_sql("orbit", v))
    if rng.random() < 0.3:
        frames = sample_scenes["frames"]
        v = int(frames[rng.integers(len(frames))])
        if rng.random() < 0.5:
            v = [v, int(frames[rng.integers(len(frames))])]
        args["frameNumber"] = v
        preds.append(_eq_or_in_sql("frameNumber", v))
    strict = bool(rng.random() < 0.5)
    args["date_strict"] = strict
    if rng.random() < 0.7:
        d = DATES[rng.integers(len(DATES))]
        args["mindate"] = d
        if STAMP_RE.search(d):  # P6: malformed → ignored
            preds.append(f"start >= {_sql_quote(d)}" if strict
                         else f"stop >= {_sql_quote(d)}")
    if rng.random() < 0.7:
        d = DATES[rng.integers(len(DATES))]
        args["maxdate"] = d
        if STAMP_RE.search(d):
            preds.append(f"stop <= {_sql_quote(d)}" if strict
                         else f"start <= {_sql_quote(d)}")
    if rng.random() < 0.5:
        pols = list(
            {POLS[rng.integers(len(POLS))] for _ in range(rng.integers(1, 4))}
        )
        args["polarizations"] = pols
        for p in pols:
            if p in ("HH", "VV", "HV", "VH"):  # P7: unknown silently dropped
                preds.append(f"{p.lower()} = 1")
    if rng.random() < 0.3:
        names = sample_scenes["names"]
        row = names[rng.integers(len(names))]
        base = row.split("/")[-1]
        args["scene"] = "some/dir/" + base if rng.random() < 0.5 else base
        preds.append(f"scene LIKE {_sql_quote('%' + base + '%')}")
    if rng.random() < 0.3:
        args["definitely_not_a_column"] = "x"  # P9: dropped, no predicate
    return args, preds


def test_select_fuzz_parity(fuzz_frames):
    scenes, con, pdf = fuzz_frames
    sample_scenes = {
        "names": pdf["scene"].tolist(),
        "frames": pdf["frameNumber"].dropna().tolist(),
    }
    mismatches = []
    n_nonempty = 0
    n_rows = 0
    for case_idx in range(100):
        rng = np.random.default_rng(1000 + case_idx)
        args, preds = _case(rng, sample_scenes)
        got = {
            r["doc_id"]
            for r in select(scenes, return_value=["doc_id"], **args).collect()
        }
        where = " AND ".join(preds) if preds else "TRUE"
        want = {
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM scenes WHERE {where}"
            ).fetchall()
        }
        if got != want:
            mismatches.append((case_idx, args, len(got), len(want)))
        if want:
            n_nonempty += 1
            n_rows += len(want)
    assert not mismatches, mismatches[:3]
    # the generator must actually exercise matching rows, not just
    # vacuously agree on empty sets (conjunctive predicates over random
    # values are selective by nature — ~1/4 non-empty with hundreds of
    # surviving rows is real coverage)
    assert n_nonempty >= 20, n_nonempty
    assert n_rows >= 500, n_rows

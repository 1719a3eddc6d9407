"""Rendering parity for the SQL-text geometry predicates (round 5).

The unrolled SAT predicates are shipped as SQL strings handed to
``F.expr`` (py4j charges per Column node: the ~520-node corners SAT
cost 2.9 s of driver wall per query BUILD when composed Column-by-
Column — BENCH/BASELINE.md round-5 follow-up). The Column-composed
builders are kept precisely so this suite can pin the claim that the
two renderings are the SAME expression: value-identical under
``eqNullSafe`` over real catalog corners, real rings, and an edge-case
battery (NULL array, empty, undersized, oversized, degenerate points).

A regression in the SQL renderer (literal suffix, precedence, comment
lexing — the ``x--60.0D`` trap) shows up here as a non-zero diff count
without needing the slower scalar-oracle fuzz to hit the broken case.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrosar_spark.operators.spatial import (
    _sat_size_branches,
    _sat_size_branches_sql,
    corners_intersect_aoi,
    flat_ring_intersects_aoi,
)

# a lopsided convex quad and a thin triangle, both with negative
# coordinates so the minus-minus comment trap is exercised
AOI_QUAD = np.array(
    [[-61.3, -12.7], [4.25, -9.5], [6.75, 8.125], [-59.875, 3.5],
     [-61.3, -12.7]]
)
AOI_TRI = np.array([[10.0, 40.0], [11.5, 40.25], [10.75, 47.0], [10.0, 40.0]])


def _corner_rows():
    """Corner arrays spanning every CASE branch incl. NULL routing."""
    rng = np.random.default_rng(77)
    rows = []
    for _ in range(300):  # random quads around both AOIs
        cx, cy = rng.uniform(-70, 20), rng.uniform(-20, 50)
        pts = np.column_stack(
            [cx + rng.uniform(-8, 8, 4), cy + rng.uniform(-8, 8, 4)]
        )
        rows.append([{"lon": float(x), "lat": float(y)} for x, y in pts])
    # size 1..3 (undersized branches), 5 (oversized -> NULL), empty, NULL
    base = [{"lon": -60.0, "lat": -10.0}, {"lon": 5.0, "lat": -10.0},
            {"lon": 5.0, "lat": 5.0}, {"lon": -60.0, "lat": 5.0},
            {"lon": -60.0, "lat": -10.0}]
    for k in (1, 2, 3, 5):
        rows.append(base[:k])
    rows.append([])
    rows.append(None)
    # degenerate: all four points identical (zero-area "hull")
    rows.append([{"lon": 1.0, "lat": 1.0}] * 4)
    return [(r,) for r in rows]


def _ring_rows():
    """Closed flat rings with 2..5 distinct points + closure, plus
    degenerate and NULL shapes."""
    rng = np.random.default_rng(78)
    rows = []
    for _ in range(300):
        k = int(rng.integers(2, 6))  # 2..5 points
        cx, cy = rng.uniform(-70, 20), rng.uniform(-20, 50)
        pts = np.column_stack(
            [cx + rng.uniform(-8, 8, k), cy + rng.uniform(-8, 8, k)]
        )
        flat = np.vstack([pts, pts[:1]]).ravel()
        rows.append([float(v) for v in flat])
    rows.append([float(v) for v in (-60.0, -10.0, -60.0, -10.0)])  # point
    rows.append([])
    rows.append(None)
    # oversized: 6 points + closure -> routed to NULL by both forms
    hexa = np.array([[0, 0], [2, 0], [3, 1], [2, 2], [0, 2], [-1, 1], [0, 0]],
                    dtype=np.float64)
    rows.append([float(v) for v in hexa.ravel()])
    return [(r,) for r in rows]


def _assert_zero_diffs(df, col_form, sql_form):
    diffs = df.where(~col_form.eqNullSafe(sql_form)).count()
    assert diffs == 0


@pytest.mark.parametrize("aoi", [AOI_QUAD, AOI_TRI], ids=["quad", "tri"])
def test_corners_sql_matches_column_rendering(spark, aoi):
    df = spark.createDataFrame(
        _corner_rows(), "corners array<struct<lon double, lat double>>"
    )

    def at(i):
        p = F.element_at(F.col("corners"), i + 1)
        return (p["lon"], p["lat"])

    col_form = _sat_size_branches(F.size(F.col("corners")), at, aoi, max_pts=4)
    _assert_zero_diffs(df, col_form, corners_intersect_aoi("corners", aoi))


@pytest.mark.parametrize("aoi", [AOI_QUAD, AOI_TRI], ids=["quad", "tri"])
def test_flat_ring_sql_matches_column_rendering(spark, aoi):
    df = spark.createDataFrame(_ring_rows(), "ring array<double>")

    def at(i):
        return (
            F.element_at(F.col("ring"), i * 2 + 1),
            F.element_at(F.col("ring"), i * 2 + 2),
        )

    col_form = _sat_size_branches(
        (F.size(F.col("ring")) / 2).cast("int"), at, aoi, max_pts=5
    )
    _assert_zero_diffs(df, col_form, flat_ring_intersects_aoi("ring", aoi))


def test_non_finite_aoi_coordinate_rejected_at_render_time():
    """``infD``/``nanD`` are JVM parse errors with no useful message;
    the renderer must refuse non-finite coordinates up front."""
    bad = np.array([[0.0, 0.0], [1.0, 0.0], [np.inf, 1.0], [0.0, 0.0]])
    with pytest.raises(ValueError, match="non-finite"):
        flat_ring_intersects_aoi("ring", bad)


def test_sql_text_has_no_comment_or_decimal_traps():
    """The rendered SQL must never contain the two lexing traps the
    renderer exists to avoid: a double literal without the D suffix
    (silently parses as DECIMAL and poisons the arithmetic) and a
    bare ``--`` (lexes as a line comment, truncating the predicate)."""
    import re

    def at(i):
        return (f"element_at(`ring`, {i * 2 + 1})",
                f"element_at(`ring`, {i * 2 + 2})")

    txt = _sat_size_branches_sql("cast(size(`ring`)/2 as int)", at,
                                 AOI_QUAD, max_pts=5)
    assert "--" not in txt
    # every float literal carries the D suffix
    bare = [
        m.group(0)
        for m in re.finditer(r"\d+\.\d+(?:[eE][+-]?\d+)?(.)?", txt)
        if (m.group(1) or "") != "D"
    ]
    assert bare == [], f"bare double literals: {bare[:5]}"

"""Scalable spatial join + kNN over lat/lon grid cells.

The reference evaluates ``st_intersects`` with a full table scan in
SpatiaLite (``pyroSAR/archive.py:1070`` — the R-tree index tables exist
but the query never uses them). At 10^12 rows that is not an option, so
the engine uses the classic two-stage distributed spatial join:

 1. **coarse**: cover each geometry's bbox with integer lat/lon grid
    cells (pure ``sequence``/``explode`` — JVM-side, no UDF) and
    equi-join on the cell id. This is the only shuffle, and it is on a
    high-cardinality key; hot cells can be salted (see
    :func:`cover_cells` ``salt`` note).
 2. **refine**: exact polygon-polygon intersect on the candidate pairs
    inside one Arrow UDF (numpy kernels from :mod:`pyrosar_spark.geom`).

Grid resolution trades replication (rows × cells/bbox) against
candidate precision; 1° matches SAR scene footprints (~2-4 cells).

kNN scene matching (SURVEY J10): candidate generation via a 3×3 cell
neighborhood ring join, haversine centroid distance, ``row_number``
top-k with deterministic tie-breaks.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from pyrosar_spark import geom

CELL_DEG = 1.0


def cell_id(lat_idx: Column, lon_idx: Column) -> Column:
    """Integer cell id for a (floor(lat), floor(lon)) pair."""
    return (lat_idx.cast("long") + 90) * 360 + (lon_idx.cast("long") + 180)


def cover_cells(
    df: DataFrame,
    xmin="xmin",
    xmax="xmax",
    ymin="ymin",
    ymax="ymax",
    cell_deg: float = CELL_DEG,
    out: str = "cell",
) -> DataFrame:
    """Explode each row into the grid cells covering its bbox.

    JVM-only (``sequence`` + ``explode``). For extreme single-cell skew
    the join key can be salted afterwards:
    ``withColumn('salt', pmod(xxhash64('doc_id'), lit(n)))`` replicated
    on the smaller side.
    """
    s = float(cell_deg)
    lat_seq = F.sequence(F.floor(F.col(ymin) / s).cast("long"), F.floor(F.col(ymax) / s).cast("long"))
    lon_seq = F.sequence(F.floor(F.col(xmin) / s).cast("long"), F.floor(F.col(xmax) / s).cast("long"))
    n_lon = int(round(360.0 / s))
    return (
        df.withColumn("_la", F.explode(lat_seq))
        .withColumn("_lo", F.explode(lon_seq))
        .withColumn(out, (F.col("_la") + int(round(90 / s))) * n_lon + F.col("_lo") + int(round(180 / s)))
        .drop("_la", "_lo")
    )


@F.pandas_udf(T.BooleanType())
def _pairs_intersect(left_ring: pd.Series, right_ring: pd.Series) -> pd.Series:
    """Exact intersects for aligned flat-ring pairs (Arrow batch).

    Groups the batch by distinct right geometry so each AOI ring is
    tested against its candidates in one vectorized call.
    """
    out = np.zeros(len(left_ring), dtype=bool)
    rkeys = right_ring.map(
        lambda r: None if r is None else np.asarray(r, dtype=np.float64).tobytes()
    )
    frame = pd.DataFrame({"l": left_ring, "r": rkeys})
    for rkey, grp in frame.groupby("r", sort=False):
        if rkey is None:
            continue
        ring = np.frombuffer(rkey, dtype=np.float64).reshape(-1, 2)
        mask = grp["l"].notna()
        idx = grp.index[mask]
        if len(idx):
            res = geom.flat_batch_intersects(list(grp.loc[idx, "l"]), ring)
            out[frame.index.get_indexer(idx)] = res
    return pd.Series(out)


def spatial_join(
    scenes: DataFrame,
    aois: DataFrame,
    cell_deg: float = CELL_DEG,
    broadcast_aoi: bool = True,
    scene_keys: list[str] | None = None,
    aoi_keys: list[str] | None = None,
    refine: str = "jvm",
) -> DataFrame:
    """Scene × AOI polygon-intersect join (J1 at many-AOI scale).

    ``scenes`` needs bbox cols + the flat ``ring`` column; ``aois`` needs
    ``aoi_id``, bbox cols (``a_xmin``...) and ``a_ring``.
    Returns scene keys × ``aoi_id`` candidate-refined pairs.

    ``refine='jvm'`` (default, round 5) evaluates the exact intersect as
    whole-stage-codegen column expressions (:func:`rings_intersect_jvm`
    — arbitrary simple polygons, touch-inclusive); ``'arrow'`` keeps the
    numpy batch kernel (A/B + differential testing). The JVM path frees
    the per-task Python workers whose ~2×-level core demand was the
    worst in-box scaling term measured (BENCH/BASELINE.md round 5).
    """
    scene_keys = scene_keys or ["doc_id"]
    if "a_ring" not in aois.columns:
        raise ValueError("aois must carry a_ring + a_xmin/a_xmax/a_ymin/a_ymax")
    if refine not in ("jvm", "arrow"):
        raise ValueError(f"unknown refine: {refine!r}")
    a = cover_cells(aois, "a_xmin", "a_xmax", "a_ymin", "a_ymax", cell_deg, out="cell")
    s = cover_cells(scenes, cell_deg=cell_deg, out="cell")
    if broadcast_aoi:
        a = F.broadcast(a)
    cand = s.join(a, on="cell", how="inner")
    # report-once dedup (r6, guide §2.4): a bbox pair shares several
    # cells, but exactly ONE of them is the canonical common cell —
    # the cell of the covers' min common corner, (max(floor(ymin/s),
    # floor(a_ymin/s)), max(floor(xmin/s), floor(a_xmin/s))) — which
    # both sides generated whenever any common cell exists (floor is
    # monotone, so max(floor x, floor y) = floor(max(x, y)) lies inside
    # both cover ranges). Keeping only that cell's match yields exactly
    # one candidate row per pair MAP-SIDE, replacing the
    # dropDuplicates whose SortAggregate sorted every candidate row
    # (with its fat ring arrays) through a full Exchange.
    sd = float(cell_deg)
    n_lon = int(round(360.0 / sd))
    canon = (
        F.greatest(
            F.floor(F.col("ymin") / sd), F.floor(F.col("a_ymin") / sd)
        ).cast("long")
        + int(round(90 / sd))
    ) * n_lon + (
        F.greatest(
            F.floor(F.col("xmin") / sd), F.floor(F.col("a_xmin") / sd)
        ).cast("long")
        + int(round(180 / sd))
    )
    keep = scene_keys + ["ring"] + (aoi_keys or ["aoi_id"]) + ["a_ring"]
    cand = cand.where(F.col("cell") == canon).select(*keep)
    if refine == "jvm":
        refined = cand.where(
            F.col("ring").isNotNull()
            & rings_intersect_jvm("ring", "a_ring")
        )
    else:
        refined = cand.where(_pairs_intersect(F.col("ring"), F.col("a_ring")))
    return refined.drop("ring", "a_ring")


def aoi_frame(spark, aoi_wkts: list[tuple[str, str]]) -> DataFrame:
    """Build the AOI side from (aoi_id, wkt) pairs (driver-side tiny)."""
    rows = []
    for aoi_id, wkt in aoi_wkts:
        ring = geom.wkt_to_ring(wkt)
        rows.append(
            (
                aoi_id,
                float(ring[:, 0].min()),
                float(ring[:, 0].max()),
                float(ring[:, 1].min()),
                float(ring[:, 1].max()),
                [float(v) for v in ring.reshape(-1)],
            )
        )
    return spark.createDataFrame(
        rows,
        "aoi_id string, a_xmin double, a_xmax double, a_ymin double, a_ymax double, a_ring array<double>",
    )


# -- JVM convex-AOI refine ---------------------------------------------------
#
# Round-5 scaling finding (BENCH/BASELINE.md, scripts/cpu_capacity_probe.py):
# an ArrowEvalPython stage runs a Python worker NEXT TO each JVM task
# thread, so its core demand is ~2x the parallelism level — the flagship's
# Python refine measured 0.40 in-box 4->16 efficiency on a host that
# delivers ~17 cores, vs ~0.87 for pure-JVM stages. For a CONVEX AOI the
# exact footprint-intersects test needs no hull and no Python: the scene
# footprint is the convex hull of its corner points, and hull-vs-convex
# intersection decomposes into three pure-arithmetic cases over the raw
# corners (whole-stage-codegen'd, evaluated only on bbox survivors):
#   1. some corner strictly/boundary inside the AOI (per-edge sign tests;
#      valid because the AOI is convex and non-degenerate),
#   2. some AOI vertex inside the hull = inside SOME triangle of corner
#      triples (orientation-free sign test; a scene-bbox guard closes the
#      collinear-triangle-line false positive),
#   3. some corner-pair segment crosses some AOI edge (hull edges are a
#      subset of corner-pair segments; a chord crossing still implies
#      intersection since chords lie inside the hull).
# Touch counts as intersecting in every case, matching the Arrow kernel.


def _orient_col(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


# The unrolled geometry predicates below are rendered as SQL TEXT and
# handed to Catalyst via one ``F.expr`` call, not composed from Column
# objects. Composing them Column-by-Column costs a py4j round trip per
# node — measured 2.9 s of DRIVER time to build the ~520-node corners
# SAT (vs 88 ms to EXECUTE it over 81k rows), re-paid on every query
# construction. The SQL string renders in microseconds of Python and
# parses JVM-side in milliseconds; the resulting expression tree (and
# thus semantics, null logic, and generated code) is identical. The
# Column-composed builders above/below are kept as an independent
# rendering for parity tests.


def _fd(v: float) -> str:
    """Exact Spark-SQL double literal. The ``D`` suffix is load-bearing
    (a bare ``1.5`` parses as DECIMAL(2,1) and would poison the
    arithmetic to decimal), and so are the parens: an unparenthesized
    negative after a minus renders ``x--60.0D``, which SQL lexes as a
    line comment. Non-finite values have no SQL literal (``infD`` is a
    parse error deep in the JVM) — reject them here with a message that
    names the real problem."""
    v = float(v)
    if not math.isfinite(v):
        raise ValueError(f"non-finite AOI coordinate {v!r} has no SQL literal")
    return f"({v!r}D)"


def _term(v) -> str:
    return _fd(v) if isinstance(v, (int, float)) else f"({v})"


def _orient_sql(ax, ay, bx, by, cx, cy) -> str:
    """SQL text of ``_orient_col``; args are floats (folded in Python)
    or SQL snippets. When both segment ends are constants the two
    differences fold to literals driver-side."""
    const_ab = isinstance(ax, (int, float)) and isinstance(bx, (int, float))
    bax = _fd(bx - ax) if const_ab else f"({_term(bx)}-{_term(ax)})"
    bay = _fd(by - ay) if const_ab else f"({_term(by)}-{_term(ay)})"
    return (f"({bax}*({_term(cy)}-{_term(ay)})"
            f" - {bay}*({_term(cx)}-{_term(ax)}))")


def aoi_ring_is_convex(ring: np.ndarray) -> bool:
    """Driver-side: is the (closed) AOI ring convex with nonzero area?
    (Degenerate line/point rings return False — the JVM path then skips
    its case-1 containment test, which needs a real interior.)"""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) < 4:  # point / segment rings
        return False
    v = r[:-1]
    nxt = np.roll(v, -1, axis=0)
    nxt2 = np.roll(v, -2, axis=0)
    cross = (nxt[:, 0] - v[:, 0]) * (nxt2[:, 1] - v[:, 1]) - (
        (nxt[:, 1] - v[:, 1]) * (nxt2[:, 0] - v[:, 0])
    )
    if abs(geom.ring_area(r)) == 0.0:
        return False
    return bool((cross >= 0).all() or (cross <= 0).all())


def _sat_convex_intersects(
    pt_cols: list[tuple[Column, Column]], aoi_ring: np.ndarray
) -> Column:
    """Separating-axis intersects of the convex hull of the given point
    COLUMNS vs a constant convex AOI — fully UNROLLED flat arithmetic
    (no higher-order functions: Spark HOF lambdas evaluate interpreted
    per element, which measured as slow as the Python kernel they were
    meant to replace; flat comparisons stay inside whole-stage codegen).

    Two convex sets are disjoint iff a STRICT separating line exists
    through an edge of one of them. Candidate axes:
     - each AOI edge (constants; CCW ⇒ interior left): separated iff
       every scene point is STRICTLY right (orient < 0);
     - each scene point-pair line (hull edges are a subset of pairs):
       separated iff the remaining scene points are all on one closed
       side while every AOI vertex is STRICTLY on the other. Degenerate
       pairs (p == q) orient to 0 for every z, so the strict AOI side
       can never hold — no false separation.
    Touching yields no strict separation ⇒ touch counts as intersect,
    matching the Arrow kernel.
    """
    ring = np.asarray(aoi_ring, dtype=np.float64).reshape(-1, 2)
    if geom.ring_area(ring) < 0:  # normalize to CCW so interior is left
        ring = ring[::-1]
    edges = [
        (float(ring[i][0]), float(ring[i][1]),
         float(ring[i + 1][0]), float(ring[i + 1][1]))
        for i in range(len(ring) - 1)
        if not (ring[i][0] == ring[i + 1][0] and ring[i][1] == ring[i + 1][1])
    ]
    verts = sorted({(float(x), float(y)) for x, y in ring[:-1]})

    def all_of(conds):
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def any_of(conds):
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    # axis family 1: AOI edges — all scene points strictly outside
    sep_aoi = any_of([
        all_of([
            _orient_col(F.lit(ax), F.lit(ay), F.lit(bx), F.lit(by), px, py) < 0
            for (px, py) in pt_cols
        ])
        for (ax, ay, bx, by) in edges
    ])

    # axis family 2: scene point-pair lines
    pair_seps = []
    n = len(pt_cols)
    for i in range(n):
        for j in range(i + 1, n):
            (px, py), (qx, qy) = pt_cols[i], pt_cols[j]
            others = [pt_cols[k] for k in range(n) if k != i and k != j]
            o_sides = [_orient_col(px, py, qx, qy, zx, zy) for (zx, zy) in others]
            a_sides = [
                _orient_col(px, py, qx, qy, F.lit(vx), F.lit(vy))
                for (vx, vy) in verts
            ]
            scene_pos = all_of([s >= 0 for s in o_sides]) if o_sides else F.lit(True)
            scene_neg = all_of([s <= 0 for s in o_sides]) if o_sides else F.lit(True)
            aoi_neg = all_of([s < 0 for s in a_sides])
            aoi_pos = all_of([s > 0 for s in a_sides])
            pair_seps.append((scene_pos & aoi_neg) | (scene_neg & aoi_pos))
    sep_pairs = any_of(pair_seps) if pair_seps else F.lit(False)

    return ~(sep_aoi | sep_pairs)


def _sat_size_branches(
    n_col: Column,
    point_at,
    aoi_ring: np.ndarray,
    max_pts: int,
) -> Column:
    """Size-guarded CASE WHEN over unrolled SAT variants (k = 1..max).

    ``point_at(i)`` must return SMALL accessor expressions over the raw
    underlying column (``corners[i].lon`` / ``element_at(ring, 2i-1)``):
    every orient test embeds copies of these subtrees, so a large
    accessor (e.g. a ``transform(...)`` normalization) multiplies the
    expression tree combinatorially and stalls Catalyst ANALYSIS — the
    first cut of this function did exactly that and planned for minutes.
    Only the matching branch evaluates per row; NULL / oversized arrays
    yield NULL (callers' ``where`` drops them, matching the Arrow
    kernel's False)."""
    expr = F.lit(None).cast("boolean")
    for k in range(1, max_pts + 1):
        expr = F.when(
            n_col == k,
            _sat_convex_intersects([point_at(i) for i in range(k)], aoi_ring),
        ).otherwise(expr)
    return expr


def _sat_convex_intersects_sql(
    pt_exprs: list[tuple[str, str]], aoi_ring: np.ndarray
) -> str:
    """SQL-text rendering of :func:`_sat_convex_intersects` — same
    axes, same strict/closed comparisons, same null logic (the parsed
    tree is node-for-node the Column one). ``pt_exprs`` are SQL
    snippets for the scene points."""
    ring = np.asarray(aoi_ring, dtype=np.float64).reshape(-1, 2)
    if geom.ring_area(ring) < 0:
        ring = ring[::-1]
    edges = [
        (float(ring[i][0]), float(ring[i][1]),
         float(ring[i + 1][0]), float(ring[i + 1][1]))
        for i in range(len(ring) - 1)
        if not (ring[i][0] == ring[i + 1][0] and ring[i][1] == ring[i + 1][1])
    ]
    verts = sorted({(float(x), float(y)) for x, y in ring[:-1]})

    def all_of(conds):
        return "(" + " AND ".join(conds) + ")"

    def any_of(conds):
        return "(" + " OR ".join(conds) + ")"

    sep_aoi = any_of([
        all_of([
            f"{_orient_sql(ax, ay, bx, by, px, py)} < 0.0D"
            for (px, py) in pt_exprs
        ])
        for (ax, ay, bx, by) in edges
    ])

    pair_seps = []
    n = len(pt_exprs)
    for i in range(n):
        for j in range(i + 1, n):
            (px, py), (qx, qy) = pt_exprs[i], pt_exprs[j]
            others = [pt_exprs[k] for k in range(n) if k != i and k != j]
            o_sides = [_orient_sql(px, py, qx, qy, zx, zy) for (zx, zy) in others]
            a_sides = [_orient_sql(px, py, qx, qy, vx, vy) for (vx, vy) in verts]
            scene_pos = all_of([f"{s} >= 0.0D" for s in o_sides]) if o_sides else "true"
            scene_neg = all_of([f"{s} <= 0.0D" for s in o_sides]) if o_sides else "true"
            aoi_neg = all_of([f"{s} < 0.0D" for s in a_sides])
            aoi_pos = all_of([f"{s} > 0.0D" for s in a_sides])
            pair_seps.append(
                f"(({scene_pos} AND {aoi_neg}) OR ({scene_neg} AND {aoi_pos}))"
            )
    sep_pairs = any_of(pair_seps) if pair_seps else "false"

    return f"(NOT ({sep_aoi} OR {sep_pairs}))"


def _sat_size_branches_sql(
    n_sql: str,
    point_at,
    aoi_ring: np.ndarray,
    max_pts: int,
) -> str:
    """SQL-text rendering of :func:`_sat_size_branches`: a CASE over
    the point count with one unrolled SAT per branch, NULL (dropped)
    otherwise. Branch conditions are disjoint, so WHEN order does not
    matter; this matches the Column version's nested ``when`` chain."""
    branches = "".join(
        f" WHEN ({n_sql}) = {k} THEN "
        + _sat_convex_intersects_sql([point_at(i) for i in range(k)], aoi_ring)
        for k in range(1, max_pts + 1)
    )
    return f"(CASE{branches} ELSE CAST(NULL AS BOOLEAN) END)"


def _sat_conjunct_sqls(
    pt_exprs: list[tuple[str, str]], aoi_ring: np.ndarray
) -> list[str]:
    """The SAT of :func:`_sat_convex_intersects_sql` decomposed into
    NOT-separated CONJUNCTS — one per AOI edge axis and one per scene
    point-pair axis. ANDing all of them is boolean-identical to
    ``NOT (sep_aoi OR sep_pairs)`` (De Morgan over the axis
    disjunction), with the same strict/closed comparisons and the same
    NULL propagation (any NULL conjunct ⇒ the row is dropped either
    way). The split exists for the CODEGEN, not the algebra: the
    single ~2.5k-node k=4/k=5 CASE expression fails Janino compilation
    (measured: 'Failed to compile the generated Java code' on every
    SAT stage since round 5) and silently falls back to interpreted
    eval; medium-sized conjuncts compile, and the same 2M-doc refine
    measured 7.3 s interpreted vs 3.6 s compiled (r6)."""
    ring = np.asarray(aoi_ring, dtype=np.float64).reshape(-1, 2)
    if geom.ring_area(ring) < 0:
        ring = ring[::-1]
    edges = [
        (float(ring[i][0]), float(ring[i][1]),
         float(ring[i + 1][0]), float(ring[i + 1][1]))
        for i in range(len(ring) - 1)
        if not (ring[i][0] == ring[i + 1][0] and ring[i][1] == ring[i + 1][1])
    ]
    verts = sorted({(float(x), float(y)) for x, y in ring[:-1]})

    def all_of(conds):
        return "(" + " AND ".join(conds) + ")"

    out = []
    for (ax, ay, bx, by) in edges:
        out.append(
            "(NOT "
            + all_of([
                f"{_orient_sql(ax, ay, bx, by, px, py)} < 0.0D"
                for (px, py) in pt_exprs
            ])
            + ")"
        )
    n = len(pt_exprs)
    for i in range(n):
        for j in range(i + 1, n):
            (px, py), (qx, qy) = pt_exprs[i], pt_exprs[j]
            others = [pt_exprs[k] for k in range(n) if k != i and k != j]
            o_sides = [_orient_sql(px, py, qx, qy, zx, zy) for (zx, zy) in others]
            a_sides = [_orient_sql(px, py, qx, qy, vx, vy) for (vx, vy) in verts]
            scene_pos = all_of([f"{s} >= 0.0D" for s in o_sides]) if o_sides else "true"
            scene_neg = all_of([f"{s} <= 0.0D" for s in o_sides]) if o_sides else "true"
            aoi_neg = all_of([f"{s} < 0.0D" for s in a_sides])
            aoi_pos = all_of([f"{s} > 0.0D" for s in a_sides])
            out.append(
                f"(NOT (({scene_pos} AND {aoi_neg}) OR ({scene_neg} AND {aoi_pos})))"
            )
    return out


def _sat_filter_columns(
    n_sql: str,
    point_at,
    aoi_ring: np.ndarray,
    max_pts: int,
    split_from: int = 4,
) -> list[Column]:
    """Conjunct-form SAT filter list: rows whose point count k is
    small (< ``split_from``) are tested by their whole (small) SAT in
    one catch-all conjunct; large-k branches contribute one conjunct
    per separating axis, each guarded ``CASE WHEN k = K THEN term ELSE
    TRUE END`` so it is vacuous for other sizes. A leading size-range
    conjunct drops k = 0, k > max_pts and NULL geometries exactly like
    the branch CASE's NULL arm did. ANDing the returned columns equals
    :func:`_sat_size_branches_sql` row-for-row."""
    out = [F.expr(f"(({n_sql}) >= 1 AND ({n_sql}) <= {max_pts})")]
    small = [k for k in range(1, min(split_from, max_pts + 1))]
    if small:
        branches = "".join(
            f" WHEN ({n_sql}) = {k} THEN "
            + _sat_convex_intersects_sql([point_at(i) for i in range(k)], aoi_ring)
            for k in small
        )
        out.append(F.expr(f"(CASE{branches} ELSE TRUE END)"))
    for k in range(split_from, max_pts + 1):
        for term in _sat_conjunct_sqls([point_at(i) for i in range(k)], aoi_ring):
            out.append(F.expr(f"(CASE WHEN ({n_sql}) = {k} THEN {term} ELSE TRUE END)"))
    return out


def corners_intersect_aoi_filters(
    corners: str, aoi_ring: np.ndarray
) -> list[Column]:
    """Conjunct-form of :func:`corners_intersect_aoi` (apply each
    returned column as a ``where``): identical row set, but the k=4
    SAT arrives as ~10 medium conjuncts that survive Janino
    compilation instead of one expression that does not (r6)."""
    q = f"`{corners}`"

    def at(i: int):
        return (f"element_at({q}, {i + 1}).lon",
                f"element_at({q}, {i + 1}).lat")

    return _sat_filter_columns(f"size({q})", at, aoi_ring, max_pts=4)


def flat_ring_intersects_aoi_filters(
    ring_col: str, aoi_ring: np.ndarray
) -> list[Column]:
    """Conjunct-form of :func:`flat_ring_intersects_aoi` (same split
    rationale; k = 4 and 5 branches are split per axis)."""
    q = f"`{ring_col}`"

    def at(i: int):
        return (f"element_at({q}, {i * 2 + 1})",
                f"element_at({q}, {i * 2 + 2})")

    return _sat_filter_columns(
        f"cast(size({q})/2 as int)", at, aoi_ring, max_pts=5
    )


def corners_intersect_aoi(corners: str, aoi_ring: np.ndarray) -> Column:
    """SAT intersects for the catalog ``corners`` column NAME
    (array<struct<lon,lat>>, universally 4 entries) vs a constant
    convex AOI — unrolled flat codegen arithmetic, rendered as ONE SQL
    string (the Column-composed rendering cost ~2.9 s of py4j driver
    time per query build; see the module note above)."""
    q = f"`{corners}`"

    def at(i: int):
        return (f"element_at({q}, {i + 1}).lon",
                f"element_at({q}, {i + 1}).lat")

    # canonical catalog corners are EXACTLY 4 points; lower counts kept
    # for robustness, higher ones routed to NULL (dropped) — branch
    # count is also Catalyst ANALYSIS cost, so no speculative headroom
    return F.expr(_sat_size_branches_sql(f"size({q})", at, aoi_ring, max_pts=4))


def flat_ring_intersects_aoi(ring_col: str, aoi_ring: np.ndarray) -> Column:
    """SAT intersects for a closed flat-ring column NAME (canonical
    3-5 points + closure) vs a constant convex AOI — one SQL string,
    tiny element_at accessors."""
    q = f"`{ring_col}`"

    def at(i: int):
        return (f"element_at({q}, {i * 2 + 1})",
                f"element_at({q}, {i * 2 + 2})")

    # canonical closed rings: 2-5 points (degenerate point/segment up
    # to quad hull + closure)
    return F.expr(_sat_size_branches_sql(
        f"cast(size({q})/2 as int)", at, aoi_ring, max_pts=5
    ))


def flat_ring_points(flat: Column) -> Column:
    """array<double> flat ring → array<array<double>> points (incl. the
    closing duplicate — harmless for the hull tests)."""
    return F.transform(
        F.sequence(F.lit(1), (F.size(flat) / 2).cast("int")),
        lambda i: F.array(F.element_at(flat, i * 2 - 1), F.element_at(flat, i * 2)),
    )


def _point_in_flat_ring_sql(px: str, py: str, flat: str) -> str:
    """Crossing-number containment of one point (SQL snippets) vs a
    closed flat ring column — arbitrary simple polygons, pure JVM.
    Mirrors ``geom.points_in_ring`` (boundary may report either side;
    callers pair this with the edge test, like the Arrow kernel does).
    The guarded division is IEEE-safe: when the first conjunct is false
    the edge never counts, and double/0 yields ±Inf/NaN, never an error
    (ANSI mode only guards integral/decimal division)."""
    ex = lambda i: f"element_at({flat}, ({i})*2-1)"  # noqa: E731
    ey = lambda i: f"element_at({flat}, ({i})*2)"  # noqa: E731
    vx, vy, wx, wy = ex("i"), ey("i"), ex("i+1"), ey("i+1")
    xint = f"({vx} + (({py}) - {vy}) / ({wy} - {vy}) * ({wx} - {vx}))"
    crossing = f"((({vy} > ({py})) != ({wy} > ({py}))) AND (({px}) < {xint}))"
    n_edges = f"(cast(size({flat})/2 as int) - 1)"
    return (f"((size(filter(sequence(1, {n_edges}), i -> {crossing})) % 2) = 1)")


def rings_intersect_jvm(ring_a: str, ring_b: str) -> Column:
    """Exact st_intersects of two closed flat-ring column NAMES as pure
    JVM column expressions (round 5): edge-pair intersection (proper +
    touching/collinear) OR either polygon's first vertex inside the
    other. Same decomposition as ``geom.FlatRings.intersects`` — valid
    for arbitrary simple polygons, touch counts as intersecting.

    Replaces the ArrowEvalPython refine in :func:`spatial_join`: a
    Python stage runs a worker process per task thread (~2× the level
    in core demand — the worst in-box scaling term, BENCH/BASELINE.md),
    while this path evaluates JVM-side only on cell-join candidates.
    Rendered as ONE SQL string — composing it from Column objects cost
    ~1 s of py4j driver time per query build (module note above)."""
    a, b = f"`{ring_a}`", f"`{ring_b}`"
    ax = lambda i: f"element_at({a}, ({i})*2-1)"  # noqa: E731
    ay = lambda i: f"element_at({a}, ({i})*2)"  # noqa: E731
    bx = lambda j: f"element_at({b}, ({j})*2-1)"  # noqa: E731
    by = lambda j: f"element_at({b}, ({j})*2)"  # noqa: E731
    na = f"(cast(size({a})/2 as int) - 1)"
    nb = f"(cast(size({b})/2 as int) - 1)"

    p1x, p1y, p2x, p2y = ax("i"), ay("i"), ax("i+1"), ay("i+1")
    q1x, q1y, q2x, q2y = bx("j"), by("j"), bx("j+1"), by("j+1")
    d1 = _orient_sql(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = _orient_sql(q1x, q1y, q2x, q2y, p2x, p2y)
    d3 = _orient_sql(p1x, p1y, p2x, p2y, q1x, q1y)
    d4 = _orient_sql(p1x, p1y, p2x, p2y, q2x, q2y)
    proper = (
        f"((({d1} > 0.0D AND {d2} < 0.0D) OR ({d1} < 0.0D AND {d2} > 0.0D))"
        f" AND (({d3} > 0.0D AND {d4} < 0.0D) OR ({d3} < 0.0D AND {d4} > 0.0D)))"
    )

    def on_seg(sx1, sy1, sx2, sy2, px, py):
        return (
            f"(least({sx1}, {sx2}) <= {px} AND {px} <= greatest({sx1}, {sx2})"
            f" AND least({sy1}, {sy2}) <= {py} AND {py} <= greatest({sy1}, {sy2}))"
        )

    touch = (
        f"(({d1} = 0.0D AND {on_seg(q1x, q1y, q2x, q2y, p1x, p1y)})"
        f" OR ({d2} = 0.0D AND {on_seg(q1x, q1y, q2x, q2y, p2x, p2y)})"
        f" OR ({d3} = 0.0D AND {on_seg(p1x, p1y, p2x, p2y, q1x, q1y)})"
        f" OR ({d4} = 0.0D AND {on_seg(p1x, p1y, p2x, p2y, q2x, q2y)}))"
    )
    edges_cross = (
        f"exists(sequence(1, {na}),"
        f" i -> exists(sequence(1, {nb}), j -> ({proper} OR {touch})))"
    )
    a_in_b = _point_in_flat_ring_sql(ax("1"), ay("1"), b)
    b_in_a = _point_in_flat_ring_sql(bx("1"), by("1"), a)
    return F.expr(f"({edges_cross} OR {a_in_b} OR {b_in_a})")


# -- kNN scene matching (J10) ------------------------------------------------


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    r = 6371.0088
    p = 3.141592653589793 / 180.0
    dlat = (lat2 - lat1) * p / 2
    dlon = (lon2 - lon1) * p / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(lat1 * p) * F.cos(lat2 * p) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))


def knn_scenes(
    scenes: DataFrame,
    k: int = 3,
    cell_deg: float = CELL_DEG,
    id_col: str = "doc_id",
) -> DataFrame:
    """k nearest neighbor scenes by footprint-centroid distance.

    Candidates come from a 3×3 cell-neighborhood self-join (each scene
    is indexed into its centroid cell and probes the 9 surrounding
    cells), so the shuffle is a cell-id equi-join, not a cross join.
    Ties broken on neighbor id — fully deterministic (SURVEY §7 hard
    part (e)). Scenes whose neighbors all fall outside the 3×3 ring
    return fewer than k matches (documented trade-off of the ring
    prefilter; widen ``cell_deg`` for sparser catalogs).
    """
    s = float(cell_deg)
    n_lon = int(round(360.0 / s))
    cent = scenes.select(
        F.col(id_col),
        ((F.col("xmin") + F.col("xmax")) / 2).alias("cx"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("cy"),
    )
    home = cent.select(
        id_col, "cx", "cy",
        F.floor(F.col("cy") / s).cast("long").alias("_la"),
        F.floor(F.col("cx") / s).cast("long").alias("_lo"),
    )
    # probe side: replicate into the 9 neighbor cells. Longitude wraps
    # (pmod); latitude CLAMPS at the poles — an unclamped _la ± 1 for a
    # pole-adjacent footprint would probe phantom rows outside
    # [-90/s, 90/s) and silently lose recall exactly where polar SAR
    # coverage is densest (VERDICT r2 #6). Clamped duplicates collapse
    # in the dropDuplicates below.
    la_lo, la_hi = -int(round(90 / s)), int(round(90 / s)) - 1
    # r6 (guide §2.4): build the 9 neighbor cells as ONE array and
    # array_distinct it BEFORE the explode. Every neighbor scene lives
    # in exactly one home cell, so with distinct probe cells each
    # (q_id, n_id) pair can meet in at most one cell — the pair-level
    # dropDuplicates (a full Exchange + two aggregates over the
    # candidate table, the join's largest intermediate) is removed
    # outright. Clamped polar duplicates collapse map-side in the
    # 9-element array instead.
    cells9 = F.array_distinct(
        F.array(
            *[
                (
                    F.greatest(
                        F.least(F.col("_la") + dy, F.lit(la_hi)), F.lit(la_lo)
                    )
                    + int(round(90 / s))
                )
                * n_lon
                + F.pmod(
                    F.col("_lo") + dx + int(round(180 / s)), F.lit(n_lon)
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    )
    probe = (
        home.withColumn("_cell", F.explode(cells9))
        .select(F.col(id_col).alias("q_id"), F.col("cx").alias("q_cx"),
                F.col("cy").alias("q_cy"), "_cell")
    )
    index = home.withColumn(
        "_cell", (F.col("_la") + int(round(90 / s))) * n_lon
        + F.pmod(F.col("_lo") + int(round(180 / s)), F.lit(n_lon))
    ).select(F.col(id_col).alias("n_id"), F.col("cx").alias("n_cx"),
             F.col("cy").alias("n_cy"), "_cell")
    cand = (
        probe.join(index, on="_cell")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("dist_km", haversine_km(F.col("q_cy"), F.col("q_cx"),
                                            F.col("n_cy"), F.col("n_cx")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("dist_km").asc(), F.col("n_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "dist_km", "rank")
    )

"""Curved-geometry linearization: CircularString arc -> LineString.

Reference: OGRGeometryFactory::curveToLineString
(/root/reference/ogr/ogrgeometryfactory.cpp:5440+), built from

* GetCurveParameters (:5176) — circle center/radius + the three
  vertex angles from (start, intermediate, end), with the
  scale-normalized determinant test (|det| < 1e-8 -> collinear) and
  the winding fixups that make alpha0..alpha2 monotone;
* OGRGF_NeedSwithArcOrder (:5381) — arcs are always stroked from the
  lexicographically larger endpoint and reversed back, so the same
  arc followed in both directions yields binary-identical vertices;
* OGRGeometryFactoryStrokeArc (:5275) — nSteps =
  int(|dalpha|/step + 0.5) clamped to >= 4, step re-divided evenly,
  vertices at alpha0 + k*step while (alpha - alpha1)*sign < -1e-8;
* the ADD_INTERMEDIATE_POINT=YES mode (:5532-5543): stroke
  alpha0->alpha1, emit the intermediate point, stroke alpha1->alpha2
  (the stealth mode's hidden-bit watermark (:5550+) is GDAL-internal
  round-trip metadata, deliberately not reproduced).

Spark shape, two stages:

1. per-arc parameters (center, radius, angles, step counts) in ONE
   Arrow-batched numpy pass (mapInPandas) — vectorized trig, map-only,
   no shuffle.  A pure-Column step chain was tried first and abandoned:
   the parameter dataflow is a deep diamond DAG (al2 -> al1 -> a1r ->
   ccx -> det -> ...), and Catalyst's projection inlining expands it
   exponentially (observed: driver OOM while optimizing).  The same
   chain runs fine as a DuckDB CTE pipeline, so ``arc_param_steps``
   below is kept as the ORACLE's independent SQL restatement of this
   kernel — stronger than shared text: two implementations, one truth.
2. vertex emission stays JVM-side: two sequence-explodes (one per
   stroke) unioned with the three control points, then a per-arc
   window re-index.  At 10^12 arcs the only wide stage is that window.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default (:4208)
TWO_PI = 2.0 * math.pi


def arc_param_steps(step_rad: float) -> list[tuple[str, str]]:
    """(name, sql_expr) chain from raw endpoint columns
    x0,y0,x1,y1,x2,y2 to stroke parameters — the ORACLE-side SQL
    restatement of ``_params_batch`` (DuckDB evaluates chained
    projections without Catalyst's inlining blowup)."""
    return [
        # NeedSwithArcOrder: stroke from the larger endpoint (:5381)
        ("swap", "x0 < x2 OR (x0 = x2 AND y0 < y2)"),
        ("ax", "CASE WHEN swap THEN x2 ELSE x0 END"),
        ("ay", "CASE WHEN swap THEN y2 ELSE y0 END"),
        ("ex", "CASE WHEN swap THEN x0 ELSE x2 END"),
        ("ey", "CASE WHEN swap THEN y0 ELSE y2 END"),
        # full-circle special case (:5189-5206)
        ("circ", "ax = ex AND ay = ey AND (ax <> x1 OR ay <> y1)"),
        ("dx01", "x1 - ax"), ("dy01", "y1 - ay"),
        ("dx12", "ex - x1"), ("dy12", "ey - y1"),
        ("nsc", "GREATEST(ABS(dx01), ABS(dy01), ABS(dx12), ABS(dy12))"),
        ("inv", "CASE WHEN nsc > 0 THEN 1.0 / nsc ELSE 0.0 END"),
        ("det", "(dx01 * inv) * (dy12 * inv) - (dx12 * inv) * (dy01 * inv)"),
        ("isarc", "circ OR ABS(det) >= 1e-8"),
        # center: perpendicular-bisector solve in normalized space
        # (:5232-5240); c01/c12 use the normalized mid-point dot products
        ("c01", "(dx01 * inv) * ((ax + x1) * inv)"
                " + (dy01 * inv) * ((ay + y1) * inv)"),
        ("c12", "(dx12 * inv) * ((x1 + ex) * inv)"
                " + (dy12 * inv) * ((y1 + ey) * inv)"),
        ("ccx", "CASE WHEN circ THEN (ax + x1) / 2"
                " WHEN isarc THEN 0.5 * nsc *"
                " (c01 * (dy12 * inv) - c12 * (dy01 * inv)) / det"
                " ELSE 0.0 END"),
        ("ccy", "CASE WHEN circ THEN (ay + y1) / 2"
                " WHEN isarc THEN 0.5 * nsc *"
                " (-c01 * (dx12 * inv) + c12 * (dx01 * inv)) / det"
                " ELSE 0.0 END"),
        ("rr", "CASE WHEN isarc THEN"
               " SQRT((ccx - ax) * (ccx - ax) + (ccy - ay) * (ccy - ay))"
               " ELSE 0.0 END"),
        ("al0", "CASE WHEN circ THEN ATAN2(ay - ccy, ax - ccx)"
                " WHEN isarc THEN"
                " ATAN2((ay - ccy) * inv, (ax - ccx) * inv)"
                " ELSE 0.0 END"),
        ("a1r", "CASE WHEN circ THEN al0 + PI() WHEN isarc THEN"
                " ATAN2((y1 - ccy) * inv, (x1 - ccx) * inv) ELSE 0.0 END"),
        ("a2r", "CASE WHEN circ THEN al0 + 2.0 * PI() WHEN isarc THEN"
                " ATAN2((ey - ccy) * inv, (ex - ccx) * inv) ELSE 0.0 END"),
        # winding fixups (:5250-5263): make alpha monotone
        ("al1", "CASE WHEN circ THEN a1r"
                " WHEN det < 0 AND a1r > al0 THEN a1r - 2.0 * PI()"
                " WHEN det >= 0 AND a1r < al0 THEN a1r + 2.0 * PI()"
                " ELSE a1r END"),
        ("al2", "CASE WHEN circ THEN a2r"
                " WHEN det < 0 AND a2r > al1 THEN a2r - 2.0 * PI()"
                " WHEN det >= 0 AND a2r < al1 THEN a2r + 2.0 * PI()"
                " ELSE a2r END"),
        ("nsign", "CASE WHEN al1 >= al0 THEN 1.0 ELSE -1.0 END"),
        # StrokeArc step division (:5281,5292,5303-5306)
        ("nsa", f"GREATEST(CAST(FLOOR(ABS((al1 - al0) / {step_rad!r})"
                " + 0.5) AS BIGINT), 4)"),
        ("stepa", "nsign * ABS((al1 - al0)) / CAST(nsa AS DOUBLE)"),
        ("nsb", f"GREATEST(CAST(FLOOR(ABS((al2 - al1) / {step_rad!r})"
                " + 0.5) AS BIGINT), 4)"),
        ("stepb", "nsign * ABS((al2 - al1)) / CAST(nsb AS DOUBLE)"),
    ]


_PARAM_SCHEMA = ("swap boolean, ax double, ay double, x1 double, y1 double, "
                 "ex double, ey double, ccx double, ccy double, rr double, "
                 "al0 double, al1 double, al2 double, nsign double, "
                 "nsa long, stepa double, nsb long, stepb double")


def _params_np(x0, y0, x1, y1, x2, y2, step_rad: float) -> dict:
    """Vectorized twin of GetCurveParameters + the curveToLineString
    prologue; every operation order mirrors the C (:5176-5263)."""
    swap = (x0 < x2) | ((x0 == x2) & (y0 < y2))
    ax = np.where(swap, x2, x0)
    ay = np.where(swap, y2, y0)
    ex = np.where(swap, x0, x2)
    ey = np.where(swap, y0, y2)
    circ = (ax == ex) & (ay == ey) & ((ax != x1) | (ay != y1))
    dx01, dy01 = x1 - ax, y1 - ay
    dx12, dy12 = ex - x1, ey - y1
    nsc = np.maximum(np.maximum(np.abs(dx01), np.abs(dy01)),
                     np.maximum(np.abs(dx12), np.abs(dy12)))
    inv = np.where(nsc > 0, 1.0 / np.where(nsc > 0, nsc, 1.0), 0.0)
    dx01n, dy01n, dx12n, dy12n = dx01 * inv, dy01 * inv, dx12 * inv, dy12 * inv
    det = dx01n * dy12n - dx12n * dy01n
    isarc = circ | (np.abs(det) >= 1e-8)
    dets = np.where(det != 0, det, 1.0)
    c01 = dx01n * ((ax + x1) * inv) + dy01n * ((ay + y1) * inv)
    c12 = dx12n * ((x1 + ex) * inv) + dy12n * ((y1 + ey) * inv)
    gcx = 0.5 * nsc * (c01 * dy12n - c12 * dy01n) / dets
    gcy = 0.5 * nsc * (-c01 * dx12n + c12 * dx01n) / dets
    ccx = np.where(circ, (ax + x1) / 2, np.where(isarc, gcx, 0.0))
    ccy = np.where(circ, (ay + y1) / 2, np.where(isarc, gcy, 0.0))
    rr = np.where(
        isarc,
        np.sqrt((ccx - ax) * (ccx - ax) + (ccy - ay) * (ccy - ay)), 0.0)
    al0 = np.where(
        circ, np.arctan2(ay - ccy, ax - ccx),
        np.where(isarc, np.arctan2((ay - ccy) * inv, (ax - ccx) * inv), 0.0))
    a1r = np.where(
        circ, al0 + math.pi,
        np.where(isarc, np.arctan2((y1 - ccy) * inv, (x1 - ccx) * inv), 0.0))
    a2r = np.where(
        circ, al0 + TWO_PI,
        np.where(isarc, np.arctan2((ey - ccy) * inv, (ex - ccx) * inv), 0.0))
    al1 = np.where(
        circ, a1r,
        np.where((det < 0) & (a1r > al0), a1r - TWO_PI,
                 np.where((det >= 0) & (a1r < al0), a1r + TWO_PI, a1r)))
    al2 = np.where(
        circ, a2r,
        np.where((det < 0) & (a2r > al1), a2r - TWO_PI,
                 np.where((det >= 0) & (a2r < al1), a2r + TWO_PI, a2r)))
    nsign = np.where(al1 >= al0, 1.0, -1.0)
    nsa = np.maximum(
        np.floor(np.abs((al1 - al0) / step_rad) + 0.5).astype(np.int64), 4)
    stepa = nsign * np.abs(al1 - al0) / nsa
    nsb = np.maximum(
        np.floor(np.abs((al2 - al1) / step_rad) + 0.5).astype(np.int64), 4)
    stepb = nsign * np.abs(al2 - al1) / nsb
    return {"swap": swap, "ax": ax, "ay": ay, "x1": x1, "y1": y1,
            "ex": ex, "ey": ey, "ccx": ccx, "ccy": ccy, "rr": rr,
            "al0": al0, "al1": al1, "al2": al2, "nsign": nsign,
            "nsa": nsa, "stepa": stepa, "nsb": nsb, "stepb": stepb}


def arc_params(df: DataFrame, id_col: str = "arc_id",
               max_step_deg: float = DEFAULT_ARC_STEP_DEG) -> DataFrame:
    """Per-arc stroke parameters, one Arrow pass."""
    step_rad = max(max_step_deg, 1e-2) / 180.0 * math.pi

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {c: pdf[c].to_numpy(dtype=np.float64)
                    for c in ("x0", "y0", "x1", "y1", "x2", "y2")}
            out = _params_np(cols["x0"], cols["y0"], cols["x1"], cols["y1"],
                             cols["x2"], cols["y2"], step_rad)
            out = {**{id_col: pdf[id_col].to_numpy()}, **out}
            yield pd.DataFrame(out)

    return df.mapInPandas(_batch, f"{id_col} long, {_PARAM_SCHEMA}")


# Stroked vertex position / emission guard (:5308-5311); same text is
# spliced into the oracle SQL.
STROKE_X = "ccx + rr * COS({a} + CAST(k AS DOUBLE) * {s})"
STROKE_Y = "ccy + rr * SIN({a} + CAST(k AS DOUBLE) * {s})"
STROKE_KEEP = "({a} + CAST(k AS DOUBLE) * {s} - {b}) * nsign < -1e-8"


def curve_to_line(df: DataFrame, id_col: str = "arc_id",
                  max_step_deg: float = DEFAULT_ARC_STEP_DEG) -> DataFrame:
    """Linearize arcs given as endpoint columns x0,y0,x1,y1,x2,y2.

    Returns (id_col, vi, x, y) vertex rows in original arc direction
    (the canonical-direction stroke is re-indexed back through the
    swap flag, so both directions of the same arc emit the same
    coordinates — the reference's symmetry guarantee).
    """
    p = arc_params(df, id_col=id_col, max_step_deg=max_step_deg)

    def _ctrl(ordv: int, xc: str, yc: str) -> DataFrame:
        return p.select(
            id_col, "swap", F.lit(ordv).alias("ord"),
            F.lit(0).cast("long").alias("k"),
            F.col(xc).alias("x"), F.col(yc).alias("y"))

    def _stroke(ordv: int, a: str, b: str, s: str, n: str) -> DataFrame:
        ks = p.select(
            id_col, "swap", "ccx", "ccy", "rr", "nsign",
            F.col(a), F.col(b), F.col(s),
            F.explode(F.sequence(F.lit(1).cast("long"),
                                 F.col(n) - 1)).alias("k"))
        return ks.filter(F.expr(STROKE_KEEP.format(a=a, b=b, s=s))).select(
            id_col, "swap", F.lit(ordv).alias("ord"), "k",
            F.expr(STROKE_X.format(a=a, s=s)).alias("x"),
            F.expr(STROKE_Y.format(a=a, s=s)).alias("y"))

    # ord classes: start, stroke A, intermediate, stroke B, end
    verts = (_ctrl(0, "ax", "ay")
             .unionByName(_stroke(1, "al0", "al1", "stepa", "nsa"))
             .unionByName(_ctrl(2, "x1", "y1"))
             .unionByName(_stroke(3, "al1", "al2", "stepb", "nsb"))
             .unionByName(_ctrl(4, "ex", "ey")))
    w = Window.partitionBy(id_col).orderBy("ord", "k")
    wc = Window.partitionBy(id_col)
    out = verts.select(
        id_col, "swap", "x", "y",
        (F.row_number().over(w) - 1).alias("fwd"),
        F.count("*").over(wc).alias("cnt"))
    return out.select(
        id_col,
        F.when(F.col("swap"), F.col("cnt") - 1 - F.col("fwd"))
         .otherwise(F.col("fwd")).cast("int").alias("vi"),
        "x", "y")


MAX_SEGS = 1024  # composite-key packing bound for compound curves

_LONG_MAX = (1 << 63) - 1


def _checked_pack(id_col: str, sub_col: str, bound: int, what: str):
    """id*bound + sub with executor-side validation: a sub index >=
    bound, a negative index, or an id large enough to overflow int64
    would silently collide keys across curves and interleave their
    vertices (ADVICE r3).  assert_true returns NULL when the predicate
    holds; coalescing it into the arithmetic forces evaluation without
    an extra pass or a driver collect."""
    ok = ((F.col(sub_col) >= 0) & (F.col(sub_col) < bound)
          & (F.col(id_col) >= 0)
          & (F.col(id_col) <= _LONG_MAX // bound - 1))
    guard = F.assert_true(
        ok, F.concat(
            F.lit(f"{what}: composite-key packing requires "
                  f"0 <= {sub_col} < {bound} and "
                  f"0 <= {id_col} <= {_LONG_MAX // bound - 1}; got "),
            F.col(id_col).cast("string"), F.lit("/"),
            F.col(sub_col).cast("string")))
    return (F.col(id_col) * bound + F.col(sub_col)
            + F.coalesce(guard.cast("long"), F.lit(0)))


def compound_curve_to_line(df: DataFrame, id_col: str = "curve_id",
                           seg_col: str = "seg",
                           max_step_deg: float = DEFAULT_ARC_STEP_DEG
                           ) -> DataFrame:
    """CompoundCurve -> LineString (OGRCompoundCurve::CurveToLineInternal,
    /root/reference/ogr/ogrcompoundcurve.cpp:309-325): each segment is
    linearized independently, then concatenated skipping every
    segment's first vertex except the first segment's
    (addSubLineString(poSubLS, iGeom == 0 ? 0 : 1)).

    Input rows: (id_col, seg_col, kind in {'arc','line'}, x0..y2) —
    'arc' segments are CircularString triples, 'line' segments carry
    their 3 vertices verbatim (CurveToLine on a LineString is the
    identity).  At most MAX_SEGS segments per curve (composite-key
    packing for the per-arc stroke).  Output: (id_col, vi, x, y).
    """
    arcs = df.filter(F.col("kind") == "arc").select(
        _checked_pack(id_col, seg_col, MAX_SEGS,
                      "compound_curve_to_line").alias("cid"),
        "x0", "y0", "x1", "y1", "x2", "y2")
    arc_v = curve_to_line(arcs, id_col="cid",
                          max_step_deg=max_step_deg).select(
        F.floor(F.col("cid") / MAX_SEGS).cast("long").alias(id_col),
        (F.col("cid") % MAX_SEGS).alias(seg_col), "vi", "x", "y")
    line_v = df.filter(F.col("kind") == "line").select(
        id_col, seg_col,
        F.posexplode(F.array(
            F.struct(F.col("x0").alias("x"), F.col("y0").alias("y")),
            F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
            F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
        )).alias("vi", "pt")).select(
        id_col, seg_col, "vi", F.col("pt.x").alias("x"),
        F.col("pt.y").alias("y"))
    allv = arc_v.unionByName(line_v).filter(
        (F.col(seg_col) == 0) | (F.col("vi") > 0))
    w = Window.partitionBy(id_col).orderBy(seg_col, "vi")
    return allv.select(
        id_col, (F.row_number().over(w) - 1).cast("int").alias("vi"),
        "x", "y")


MAX_RINGS = 64  # composite-key packing bound for curve polygons


def curve_polygon_to_polygon(df: DataFrame, id_col: str = "poly_id",
                             ring_col: str = "ring", seg_col: str = "seg",
                             max_step_deg: float = DEFAULT_ARC_STEP_DEG
                             ) -> DataFrame:
    """CurvePolygon -> Polygon (OGRCurvePolygon::CurvePolyToPoly,
    /root/reference/ogr/ogrcurvepolygon.cpp:578-596): every ring is
    CurveToLine'd independently (compound rings supported — each ring
    is a compound-curve segment list) and re-attached to its polygon.
    Closure is a data property: a valid input ring's last segment ends
    where the first begins, so the stroked ring closes exactly (the
    endpoint vertices are emitted verbatim, never recomputed).

    Input rows: (id_col, ring_col, seg_col, kind, x0..y2); output
    (id_col, ring_col, vi, x, y) with vi the per-ring vertex index.
    """
    packed = df.select(
        _checked_pack(id_col, ring_col, MAX_RINGS,
                      "curve_polygon_to_polygon").alias("rkey"),
        F.col(seg_col).alias("seg"), "kind",
        "x0", "y0", "x1", "y1", "x2", "y2")
    v = compound_curve_to_line(packed, id_col="rkey", seg_col="seg",
                               max_step_deg=max_step_deg)
    return v.select(
        F.floor(F.col("rkey") / MAX_RINGS).cast("long").alias(id_col),
        (F.col("rkey") % MAX_RINGS).cast("int").alias(ring_col),
        "vi", "x", "y")


def circularstring_to_line(df: DataFrame, id_col: str = "cs_id",
                           vi_col: str = "vi", x_col: str = "x",
                           y_col: str = "y",
                           max_step_deg: float = DEFAULT_ARC_STEP_DEG
                           ) -> DataFrame:
    """Multi-arc CircularString -> LineString
    (OGRCircularString::CurveToLine,
    /root/reference/ogr/ogrcircularstring.cpp:646-664): vertices
    2j, 2j+1, 2j+2 form arc j (i += 2 walk), each stroked by
    curveToLineString and concatenated skipping every non-first arc's
    start vertex — i.e. exactly a compound curve whose segments are
    all arcs.  Input: a vertex table (id, vi, x, y) with odd point
    count per string; output (id, vi, x, y) re-indexed.

    The triple reshape is two window leads (one shuffle by string id,
    shared with the final re-index); the stroke reuses the
    compound-curve kernel.  Up to MAX_SEGS arcs per string.
    """
    w = Window.partitionBy(id_col).orderBy(vi_col)
    segs = (df.select(
                F.col(id_col), F.col(vi_col).alias("vi"),
                F.col(x_col).alias("x0"), F.col(y_col).alias("y0"),
                F.lead(x_col, 1).over(w).alias("x1"),
                F.lead(y_col, 1).over(w).alias("y1"),
                F.lead(x_col, 2).over(w).alias("x2"),
                F.lead(y_col, 2).over(w).alias("y2"))
            .filter((F.col("vi") % 2 == 0) & F.col("x2").isNotNull())
            .select(F.col(id_col),
                    (F.col("vi") / 2).cast("int").alias("seg"),
                    F.lit("arc").alias("kind"),
                    "x0", "y0", "x1", "y1", "x2", "y2"))
    return compound_curve_to_line(segs, id_col=id_col, seg_col="seg",
                                  max_step_deg=max_step_deg)

"""Arc linearization (operators/curve.py) vs a direct serial
transcription of ogrgeometryfactory.cpp curveToLineString
(ADD_INTERMEDIATE_POINT=YES mode)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import curve as cv

TWO_PI = 2.0 * math.pi


def _params(x0, y0, x1, y1, x2, y2):
    # GetCurveParameters (ogrgeometryfactory.cpp:5176)
    if x0 == x2 and y0 == y2:
        if x0 != x1 or y0 != y1:
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            r = math.hypot(x0 - cx, y0 - cy)
            a0 = math.atan2(y0 - cy, x0 - cx)
            return r, cx, cy, a0, a0 + math.pi, a0 + TWO_PI
        return None
    dx01, dy01, dx12, dy12 = x1 - x0, y1 - y0, x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv; dy01 *= inv; dx12 *= inv; dy12 *= inv  # noqa: E702
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1e-8:
        return None
    x01m, x12m = (x0 + x1) * inv, (x1 + x2) * inv
    y01m, y12m = (y0 + y1) * inv, (y1 + y2) * inv
    c01 = dx01 * x01m + dy01 * y01m
    c12 = dx12 * x12m + dy12 * y12m
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    r = math.hypot(cx - x0, cy - y0)
    if det < 0:
        if a1 > a0:
            a1 -= TWO_PI
        if a2 > a1:
            a2 -= TWO_PI
    else:
        if a1 < a0:
            a1 += TWO_PI
        if a2 < a1:
            a2 += TWO_PI
    return r, cx, cy, a0, a1, a2


def _stroke(pts, cx, cy, r, a, b, step):
    # OGRGeometryFactoryStrokeArc (:5275), non-stealth
    nsign = 1 if step > 0 else -1
    n = int(abs((b - a) / step) + 0.5)
    if n < 4:
        n = 4
    st = nsign * abs((b - a) / n)
    al = a + st
    while (al - b) * nsign < -1e-8:
        pts.append((cx + r * math.cos(al), cy + r * math.sin(al)))
        al += st


def serial_curve_to_line(x0, y0, x1, y1, x2, y2, maxdeg=4.0):
    if x0 < x2 or (x0 == x2 and y0 < y2):
        return serial_curve_to_line(x2, y2, x1, y1, x0, y0, maxdeg)[::-1]
    prm = _params(x0, y0, x1, y1, x2, y2)
    if prm is None:
        r = cx = cy = a0 = a1 = a2 = 0.0
    else:
        r, cx, cy, a0, a1, a2 = prm
    nsign = 1 if a1 >= a0 else -1
    step = max(maxdeg, 1e-2) / 180.0 * math.pi * nsign
    pts = [(x0, y0)]
    _stroke(pts, cx, cy, r, a0, a1, step)
    pts.append((x1, y1))
    _stroke(pts, cx, cy, r, a1, a2, step)
    pts.append((x2, y2))
    return pts


ARCS = [
    (0.0, 0.0, 1.0, 1.0, 2.0, 0.0),        # ccw half-ish arc
    (2.0, 0.0, 1.0, 1.0, 0.0, 0.0),        # same arc, reversed
    (0.0, 0.0, 1.0, -1.0, 2.0, 0.0),       # cw
    (5.0, 5.0, 6.0, 6.0, 7.0, 7.0),        # collinear -> 3-point line
    (3.0, 0.0, -3.0, 0.0, 3.0, 0.0),       # full circle (p0 == p2)
    (10.0, 2.0, 11.5, 7.25, 4.0, 9.0),     # generic
    (-40.0, 12.0, -35.0, 30.0, -20.0, 11.0),
]


def test_serial_reversal_symmetry():
    fwd = serial_curve_to_line(*ARCS[0])
    rev = serial_curve_to_line(*ARCS[1])
    assert fwd == rev[::-1]


def test_serial_collinear_and_circle():
    assert serial_curve_to_line(*ARCS[3]) == [(5, 5), (6, 6), (7, 7)]
    circ = serial_curve_to_line(*ARCS[4])
    assert len(circ) > 80  # 360/4 deg + intermediates
    for x, y in circ:
        assert math.hypot(x, y) == pytest.approx(3.0, abs=1e-9)


def test_distributed_matches_serial(spark):
    df = spark.createDataFrame(
        [(i, *a) for i, a in enumerate(ARCS)],
        "arc_id long, x0 double, y0 double, x1 double, y1 double, "
        "x2 double, y2 double")
    got = cv.curve_to_line(df).collect()
    by_arc = {}
    for r in got:
        by_arc.setdefault(r["arc_id"], {})[r["vi"]] = (r["x"], r["y"])
    for i, a in enumerate(ARCS):
        ref = serial_curve_to_line(*a)
        pts = by_arc[i]
        assert len(pts) == len(ref), f"arc {i}: {len(pts)} vs {len(ref)}"
        for vi, (x, y) in pts.items():
            rx, ry = ref[vi]
            assert x == pytest.approx(rx, abs=1e-9), (i, vi)
            assert y == pytest.approx(ry, abs=1e-9), (i, vi)


def test_distributed_random_battery(spark):
    rng = np.random.default_rng(7)
    arcs = [(int(i), *(float(v) for v in rng.uniform(-50, 50, 6)))
            for i in range(60)]
    df = spark.createDataFrame(
        arcs, "arc_id long, x0 double, y0 double, x1 double, y1 double, "
        "x2 double, y2 double")
    got = cv.curve_to_line(df, max_step_deg=9.0).collect()
    by_arc = {}
    for r in got:
        by_arc.setdefault(r["arc_id"], {})[r["vi"]] = (r["x"], r["y"])
    for i, *a in arcs:
        ref = serial_curve_to_line(*a, maxdeg=9.0)
        pts = by_arc[i]
        assert len(pts) == len(ref), f"arc {i}"
        for vi, (x, y) in pts.items():
            assert x == pytest.approx(ref[vi][0], abs=1e-8)
            assert y == pytest.approx(ref[vi][1], abs=1e-8)


def test_plan_shape(spark):
    # params = ONE Arrow batch stage; vertex emission = JVM explodes;
    # never row-at-a-time Python.
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 1.0, 2.0, 0.0)],
        "arc_id long, x0 double, y0 double, x1 double, y1 double, "
        "x2 double, y2 double")
    plan = cv.curve_to_line(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("Generate") == 2  # the two sequence-explode strokes


def test_compound_curve_joint_rule(spark):
    # line + arc + line; joints must appear exactly once
    # (ogrcompoundcurve.cpp:309-325)
    segs = [
        (5, 0, "line", 0.0, 0.0, 1.0, 0.5, 2.0, 1.0),
        (5, 1, "arc", 2.0, 1.0, 3.0, 2.0, 4.0, 1.0),
        (5, 2, "line", 4.0, 1.0, 5.0, 0.5, 6.0, 0.0),
    ]
    df = spark.createDataFrame(
        segs, "curve_id long, seg int, kind string, x0 double, y0 double, "
        "x1 double, y1 double, x2 double, y2 double")
    got = sorted(cv.compound_curve_to_line(df).collect(),
                 key=lambda r: r["vi"])
    ref = []
    for _, si, kind, *pts in segs:
        if kind == "arc":
            sub = serial_curve_to_line(*pts)
        else:
            sub = [(pts[0], pts[1]), (pts[2], pts[3]), (pts[4], pts[5])]
        ref.extend(sub if si == 0 else sub[1:])
    assert len(got) == len(ref)
    assert [r["vi"] for r in got] == list(range(len(ref)))
    for r, (x, y) in zip(got, ref):
        assert r["x"] == pytest.approx(x, abs=1e-9)
        assert r["y"] == pytest.approx(y, abs=1e-9)
    # joints (2,1) and (4,1) each appear exactly once
    coords = [(round(r["x"], 6), round(r["y"], 6)) for r in got]
    assert coords.count((2.0, 1.0)) == 1 and coords.count((4.0, 1.0)) == 1


def test_curve_polygon_rings(spark):
    # one CurvePolygon: exterior = line+arc closing back, hole = 3 lines
    segs = [
        # exterior ring 0: line (0,0)->(4,0), arc (4,0)->(2,3)->(0,0)
        (9, 0, 0, "line", 0.0, 0.0, 2.0, 0.0, 4.0, 0.0),
        (9, 0, 1, "arc", 4.0, 0.0, 2.0, 3.0, 0.0, 0.0),
        # hole ring 1: triangle of 3 line segments (closed)
        (9, 1, 0, "line", 1.0, 0.5, 1.5, 0.5, 2.0, 0.5),
        (9, 1, 1, "line", 2.0, 0.5, 1.75, 1.0, 1.5, 1.5),
        (9, 1, 2, "line", 1.5, 1.5, 1.25, 1.0, 1.0, 0.5),
    ]
    df = spark.createDataFrame(
        segs, "poly_id long, ring int, seg int, kind string, x0 double, "
        "y0 double, x1 double, y1 double, x2 double, y2 double")
    rows = cv.curve_polygon_to_polygon(df).collect()
    rings = {}
    for r in rows:
        rings.setdefault(r["ring"], {})[r["vi"]] = (r["x"], r["y"])
    # both rings closed: first vertex == last vertex
    for rid, pts in rings.items():
        seq = [pts[i] for i in range(len(pts))]
        assert seq[0] == seq[-1], rid
    # exterior has stroked arc vertices, hole has exactly 7 (3 segs * 3
    # pts, two joints deduped... 9 - 2 = 7)
    assert len(rings[1]) == 7
    assert len(rings[0]) > 10


def test_circularstring_multi_arc(spark):
    # 5 points = 2 arcs (ogrcircularstring.cpp:646-664 i += 2 walk)
    pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0), (3.0, -1.0), (4.0, 0.0)]
    df = spark.createDataFrame(
        [(1, i, x, y) for i, (x, y) in enumerate(pts)],
        "cs_id long, vi int, x double, y double")
    got = sorted(cv.circularstring_to_line(df).collect(),
                 key=lambda r: r["vi"])
    ref = []
    for j in (0, 2):
        sub = serial_curve_to_line(*pts[j], *pts[j + 1], *pts[j + 2])
        ref.extend(sub if j == 0 else sub[1:])
    assert len(got) == len(ref)
    for r, (x, y) in zip(got, ref):
        assert r["x"] == pytest.approx(x, abs=1e-9)
        assert r["y"] == pytest.approx(y, abs=1e-9)


def test_packing_bounds_fail_fast(spark):
    """Composite-key packing validates indices (ADVICE r3): a seg
    index >= MAX_SEGS must raise, not silently collide keys."""
    import pytest
    from gdal_spark.operators.curve import MAX_SEGS, compound_curve_to_line

    bad = spark.createDataFrame(
        [(1, MAX_SEGS, "arc", 0.0, 0.0, 1.0, 1.0, 2.0, 0.0)],
        "curve_id long, seg int, kind string, x0 double, y0 double,"
        " x1 double, y1 double, x2 double, y2 double")
    with pytest.raises(Exception, match="composite-key packing"):
        compound_curve_to_line(bad).collect()

    ok = spark.createDataFrame(
        [(1, 0, "arc", 0.0, 0.0, 1.0, 1.0, 2.0, 0.0)],
        "curve_id long, seg int, kind string, x0 double, y0 double,"
        " x1 double, y1 double, x2 double, y2 double")
    assert compound_curve_to_line(ok).count() > 2


# ------------------------------------------------------ Z linearization
def test_curve_to_line_z_angular_lerp():
    """Z interpolates by ANGLE fraction between control points
    (ogrcircularstring.cpp:403-419), and (x, y) bit-match the 2-D
    stroke."""
    import numpy as np
    from gdal_spark.kernels import arc as ka

    p0, p1, p2 = (10.0, 0.0, 100.0), (0.0, 10.0, 200.0), (-10.0, 0.0, 300.0)
    got = ka.curve_to_line_z(p0, p1, p2)
    flat = ka.curve_to_line(p0[0], p0[1], p1[0], p1[1], p2[0], p2[1])
    assert [(x, y) for x, y, _ in got] == flat
    zs = [z for _, _, z in got]
    assert zs[0] == 100.0 and zs[-1] == 300.0 and 200.0 in zs
    # half circle at uniform angular steps -> z strictly monotone
    assert all(b > a for a, b in zip(zs, zs[1:]))
    # the vertex at angle midpoint of the first half-arc carries the
    # angular midpoint z
    n_half = (len(zs) - 1) // 2
    mid = got[n_half // 2]
    frac = (np.arctan2(mid[1], mid[0]) - 0.0) / (np.pi / 2)
    # first half-arc spans angles 0..pi/2 (from (10,0) to (0,10))
    assert mid[2] == pytest.approx(100.0 + 100.0 * frac, rel=1e-9)


def test_st_curvetoline_z_roundtrip(spark):
    import numpy as np
    from gdal_spark.functions.st import register_st_functions
    from gdal_spark.kernels import wkb as kw
    from pyspark.sql import Row

    register_st_functions(spark)
    cs = kw.wkb_circularstring(np.array(
        [[10, 0, 5], [0, 10, 7], [-10, 0, 9]], dtype=np.float64), z=True)
    df = spark.createDataFrame([Row(g=bytearray(cs))])
    df.createOrReplaceTempView("curvez")
    out = spark.sql("SELECT st_curvetoline(g) AS l FROM curvez").collect()
    base, hz, hm, pts = kw.parse_wkb_full(bytes(out[0]["l"]))
    assert base == kw.LINESTRING and hz and not hm
    assert pts.shape[1] == 3 and len(pts) > 10
    assert pts[0][2] == 5.0 and pts[-1][2] == 9.0

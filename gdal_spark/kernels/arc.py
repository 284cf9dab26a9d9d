"""Serial arc-stroke kernel: scalar twin of operators/curve.py.

Direct transcription of OGRGeometryFactory::curveToLineString
(/root/reference/ogr/ogrgeometryfactory.cpp:5440, ADD_INTERMEDIATE_
POINT mode), GetCurveParameters (:5176) and
OGRGeometryFactoryStrokeArc (:5275) — used by the ST_CurveToLine
scalar function (functions/st.py) where per-geometry Python is the
registry contract; the DISTRIBUTED path for bulk linearization is
operators/curve.py (Arrow param pass + JVM explodes), and
tests/test_curve.py keeps its own independent copy of these
recurrences as the checker.
"""

from __future__ import annotations

import math

TWO_PI = 2.0 * math.pi


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """(R, cx, cy, alpha0, alpha1, alpha2) or None for collinear."""
    if x0 == x2 and y0 == y2:
        if x0 != x1 or y0 != y1:
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            r = math.sqrt((cx - x0) ** 2 + (cy - y0) ** 2)
            a0 = math.atan2(y0 - cy, x0 - cx)
            return r, cx, cy, a0, a0 + math.pi, a0 + TWO_PI
        return None
    dx01, dy01, dx12, dy12 = x1 - x0, y1 - y0, x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1e-8:
        return None
    c01 = dx01 * ((x0 + x1) * inv) + dy01 * ((y0 + y1) * inv)
    c12 = dx12 * ((x1 + x2) * inv) + dy12 * ((y1 + y2) * inv)
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    r = math.sqrt((cx - x0) ** 2 + (cy - y0) ** 2)
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
    nsign = 1 if step > 0 else -1
    n = int(abs((b - a) / step) + 0.5)
    if n < 4:
        n = 4
    st = nsign * abs((b - a) / n)
    al = a + st
    while (al - b) * nsign < -1e-8:
        pts.append((cx + r * math.cos(al), cy + r * math.sin(al)))
        al += st


def curve_to_line(x0, y0, x1, y1, x2, y2, max_step_deg: float = 4.0):
    """One arc triple -> vertex list (ADD_INTERMEDIATE_POINT mode)."""
    if x0 < x2 or (x0 == x2 and y0 < y2):
        return curve_to_line(x2, y2, x1, y1, x0, y0, max_step_deg)[::-1]
    prm = get_curve_parameters(x0, y0, x1, y1, x2, y2)
    if prm is None:
        r = cx = cy = a0 = a1 = a2 = 0.0
    else:
        r, cx, cy, a0, a1, a2 = prm
    nsign = 1 if a1 >= a0 else -1
    step = max(max_step_deg, 1e-2) / 180.0 * math.pi * nsign
    pts = [(x0, y0)]
    _stroke(pts, cx, cy, r, a0, a1, step)
    pts.append((x1, y1))
    _stroke(pts, cx, cy, r, a1, a2, step)
    pts.append((x2, y2))
    return pts


def circularstring_to_line(coords, max_step_deg: float = 4.0):
    """Multi-arc CircularString vertices -> LineString vertex list
    (ogrcircularstring.cpp:646-664: i += 2 walk, skip joint)."""
    out = []
    for i in range(0, len(coords) - 2, 2):
        sub = curve_to_line(coords[i][0], coords[i][1],
                            coords[i + 1][0], coords[i + 1][1],
                            coords[i + 2][0], coords[i + 2][1],
                            max_step_deg)
        out.extend(sub if i == 0 else sub[1:])
    return out


def curve_to_line_z(p0, p1, p2, max_step_deg: float = 4.0):
    """Z-aware arc stroke: identical (x, y) vertices to curve_to_line,
    with Z linearly interpolated by ANGLE fraction between control
    points — OGRCircularString::getLinearGeometry's padfZ handling
    (/root/reference/ogr/ogrcircularstring.cpp:403-419,439-447:
    z = z_i + (z_{i+1} - z_i) * (alpha - alpha_i)/(alpha_{i+1} -
    alpha_i) on each half-arc)."""
    (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = p0, p1, p2
    if x0 < x2 or (x0 == x2 and y0 < y2):
        return curve_to_line_z(p2, p1, p0, max_step_deg)[::-1]
    prm = get_curve_parameters(x0, y0, x1, y1, x2, y2)
    if prm is None:
        r = cx = cy = a0 = a1 = a2 = 0.0
    else:
        r, cx, cy, a0, a1, a2 = prm
    nsign = 1 if a1 >= a0 else -1
    step = max(max_step_deg, 1e-2) / 180.0 * math.pi * nsign
    pts = [(x0, y0, z0)]
    _stroke_z(pts, cx, cy, r, a0, a1, z0, z1, step)
    pts.append((x1, y1, z1))
    _stroke_z(pts, cx, cy, r, a1, a2, z1, z2, step)
    pts.append((x2, y2, z2))
    return pts


def _stroke_z(pts, cx, cy, r, a, b, z_a, z_b, step):
    nsign = 1 if step > 0 else -1
    n = int(abs((b - a) / step) + 0.5)
    if n < 4:
        n = 4
    st = nsign * abs((b - a) / n)
    al = a + st
    while (al - b) * nsign < -1e-8:
        frac = (al - a) / (b - a) if b != a else 0.0
        pts.append((cx + r * math.cos(al), cy + r * math.sin(al),
                    z_a + (z_b - z_a) * frac))
        al += st


def circularstring_to_line_z(coords, max_step_deg: float = 4.0):
    """Z-carrying CircularString vertices (n, 3) -> LineString vertex
    list with per-half-arc angular Z lerp."""
    out = []
    for i in range(0, len(coords) - 2, 2):
        sub = curve_to_line_z(tuple(coords[i]), tuple(coords[i + 1]),
                              tuple(coords[i + 2]), max_step_deg)
        out.extend(sub if i == 0 else sub[1:])
    return out

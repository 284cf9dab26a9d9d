"""Linear referencing (ogrlineref roles) vs straight geometry math.

The operator is pure Column math; these tests pin the semantics with
hand-computable polylines (apps/ogrlineref.cpp GetPosition /
CreatePartsFromPoint rules, PostGIS ST_Line_Interpolate_Point /
ST_Line_Locate_Point equivalence).
"""

from __future__ import annotations

import math

import pytest

from gdal_spark.operators.lineref import interpolate_along, locate_point


def _lines(spark, rows):
    return spark.createDataFrame(rows, "line_id long, xs array<double>, ys array<double>")


def test_interpolate_simple_L(spark):
    # L-shape: (0,0)->(10,0)->(10,10), total 20.  25% -> (5, 0); 75% -> (10, 5)
    df = _lines(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])])
    p25 = interpolate_along(df, 0.25).collect()[0]
    assert (p25["x"], p25["y"]) == (5.0, 0.0)
    p75 = interpolate_along(df, 0.75).collect()[0]
    assert (p75["x"], p75["y"]) == (10.0, 5.0)


def test_interpolate_vertex_boundary(spark):
    # fraction landing exactly on a shared vertex picks the first
    # bracketing segment (si ascending) -> same point either way
    df = _lines(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])])
    p50 = interpolate_along(df, 0.5).collect()[0]
    assert (p50["x"], p50["y"]) == (10.0, 0.0)


def test_interpolate_endpoints(spark):
    df = _lines(spark, [(7, [2.0, 4.0, 8.0], [1.0, 1.0, 1.0])])
    p0 = interpolate_along(df, 0.0).collect()[0]
    assert (p0["x"], p0["y"]) == (2.0, 1.0)
    p1 = interpolate_along(df, 1.0).collect()[0]
    assert (p1["x"], p1["y"]) == (8.0, 1.0)


def test_interpolate_degenerate_segment(spark):
    # repeated vertex (zero-length segment) must not divide by zero
    df = _lines(spark, [(1, [0.0, 0.0, 10.0], [0.0, 0.0, 0.0])])
    p = interpolate_along(df, 0.5).collect()[0]
    assert (p["x"], p["y"]) == (5.0, 0.0)


def test_locate_projection(spark):
    # point (5, 3) projects onto the first segment of the L at t=0.5
    # -> distance along = 5 of 20 -> frac 0.25
    lines = _lines(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])])
    pts = spark.createDataFrame([(1, 0, 5.0, 3.0)],
                                "line_id long, pid long, px double, py double")
    r = locate_point(lines, pts).collect()[0]
    assert r["frac"] == pytest.approx(0.25)


def test_locate_clamps_to_segment(spark):
    # point beyond the line end clamps to t=1 on the last segment
    lines = _lines(spark, [(1, [0.0, 10.0], [0.0, 0.0])])
    pts = spark.createDataFrame([(1, 0, 99.0, 1.0)],
                                "line_id long, pid long, px double, py double")
    r = locate_point(lines, pts).collect()[0]
    assert r["frac"] == pytest.approx(1.0)


def test_locate_tie_breaks_lowest_si(spark):
    # equidistant from two segments: argmin (d2, si) picks the earlier one
    lines = _lines(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])])
    pts = spark.createDataFrame([(1, 0, 10.0, 0.0)],
                                "line_id long, pid long, px double, py double")
    r = locate_point(lines, pts).collect()[0]
    # vertex shared by both segments; earlier segment yields frac = 10/20
    assert r["frac"] == pytest.approx(0.5)


def test_many_lines_roundtrip(spark):
    # interpolate then locate recovers the fraction, per line
    rows = []
    for lid in range(6):
        xs = [float(i * (lid + 1)) for i in range(5)]
        ys = [float((i * i) % 7) for i in range(5)]
        rows.append((lid, xs, ys))
    lines = _lines(spark, rows)
    pts = interpolate_along(lines, 0.4).selectExpr(
        "line_id", "line_id as pid", "x as px", "y as py")
    out = {r["line_id"]: r["frac"] for r in locate_point(lines, pts).collect()}
    for lid in range(6):
        assert out[lid] == pytest.approx(0.4, abs=1e-9)


# ------------------------------------------------------- line_substring
def _sub(spark, rows, d0, d1, as_ratio=True):
    from gdal_spark.operators.lineref import line_substring
    out = line_substring(_lines(spark, rows), d0, d1, as_ratio)
    got = {}
    for r in out.collect():
        got.setdefault(r["line_id"], []).append((r["vi"], r["x"], r["y"]))
    return {k: [(x, y) for _, x, y in sorted(v)] for k, v in got.items()}


def test_substring_interior(spark):
    # L-shape (0,0)->(10,0)->(10,10), len 20; [0.2, 0.7] -> 4..14
    got = _sub(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])], 0.2, 0.7)
    assert got[1] == [(4.0, 0.0), (10.0, 0.0), (10.0, 4.0)]


def test_substring_same_segment(spark):
    got = _sub(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])],
               0.1, 0.3)
    assert got[1] == [(2.0, 0.0), (6.0, 0.0)]


def test_substring_absolute_distances(spark):
    got = _sub(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])],
               5.0, 15.0, as_ratio=False)
    assert got[1] == [(5.0, 0.0), (10.0, 0.0), (10.0, 5.0)]


def test_substring_zero_start_quirk(spark):
    # GDAL quirk (ogrlinestring.cpp:2286-2296 + :2342): getSubLine
    # with dfDistanceFrom == 0 emits the first vertex TWICE because
    # the "Add points" loop restarts at i = 0.  Reproduced exactly.
    got = _sub(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])],
               0.0, 1.0)
    assert got[1] == [(0.0, 0.0), (0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]


def test_substring_skips_zero_length_segments(spark):
    # line (0,0)->(10,0)->(10,0)->(10,10), d in [10, 15]: d0 brackets
    # segment 0 at ratio 1 (the seglen > 0 guard at :2305 keeps the
    # zero-length segment 1 from bracketing); the middle loop then
    # re-adds P1 and P2 (both (10,0)) before interpolating the end —
    # four vertices, exactly as the reference walks it
    got = _sub(spark, [(1, [0.0, 10.0, 10.0, 10.0],
                        [0.0, 0.0, 0.0, 10.0])], 0.5, 0.75)
    assert got[1] == [(10.0, 0.0), (10.0, 0.0), (10.0, 0.0), (10.0, 5.0)]


def test_substring_to_end(spark):
    got = _sub(spark, [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 10.0])],
               0.25, 1.0)
    assert got[1] == [(5.0, 0.0), (10.0, 0.0), (10.0, 10.0)]


# ----------------------------------------------------------- segmentize
def _segz(spark, rows, maxlen):
    from gdal_spark.operators.lineref import segmentize
    out = segmentize(_lines(spark, rows), maxlen)
    got = {}
    for r in out.collect():
        got.setdefault(r["line_id"], []).append((r["vi"], r["x"], r["y"]))
    return {k: [(x, y) for _, x, y in sorted(v)] for k, v in got.items()}


def test_segmentize_splits_long_segments(spark):
    # (10,0)->(0,0) [reference keeps this orientation: P0 > Pn]:
    # len 10, maxlen 4 -> n_int = floor(sqrt(100/16) - 0.01) = 2
    got = _segz(spark, [(1, [10.0, 0.0], [0.0, 0.0])], 4.0)
    xs = [p[0] for p in got[1]]
    assert xs == [10.0, 10.0 - 10.0 / 3, 10.0 - 20.0 / 3, 0.0]


def test_segmentize_no_split_below_threshold(spark):
    got = _segz(spark, [(1, [3.0, 0.0], [0.0, 0.0])], 4.0)
    assert got[1] == [(3.0, 0.0), (0.0, 0.0)]


def test_segmentize_direction_invariance(spark):
    # the reference's reversal normalization: a line and its reverse
    # produce exactly mirrored vertex sequences (:2674-2682)
    fwd = _segz(spark, [(1, [0.0, 7.0, 13.0], [0.0, 3.0, 1.0])], 2.5)
    bwd = _segz(spark, [(1, [13.0, 7.0, 0.0], [1.0, 3.0, 0.0])], 2.5)
    assert fwd[1] == list(reversed(bwd[1]))


def test_segmentize_epsilon_rule(spark):
    # d2 exactly == maxlen^2 does NOT split (needs > 1e-5 * m2 excess)
    got = _segz(spark, [(1, [4.0, 0.0], [0.0, 0.0])], 4.0)
    assert got[1] == [(4.0, 0.0), (0.0, 0.0)]


def test_segmentize_serial_parity(spark):
    # transcription of the reference loop (ogrlinestring.cpp second
    # pass) as the serial twin, on an irregular multi-segment line
    import math

    def serial(xs, ys, maxlen):
        if (xs[0] < xs[-1]) or (xs[0] == xs[-1] and ys[0] < ys[-1]):
            pts = serial(list(reversed(xs)), list(reversed(ys)), maxlen)
            return list(reversed(pts))
        out = []
        m2 = maxlen * maxlen
        for i in range(len(xs)):
            out.append((xs[i], ys[i]))
            if i == len(xs) - 1:
                break
            dx, dy = xs[i + 1] - xs[i], ys[i + 1] - ys[i]
            d2 = dx * dx + dy * dy
            if d2 - m2 > 1e-5 * m2:
                n = int(math.floor(math.sqrt(d2 / m2) - 1e-2))
                rx, ry = dx / (n + 1), dy / (n + 1)
                for j in range(1, n + 1):
                    out.append((xs[i] + j * rx, ys[i] + j * ry))
        return out

    xs = [2.0, 9.5, 9.5, 1.0, 30.0]
    ys = [1.0, 4.0, -6.0, -6.5, 2.25]
    got = _segz(spark, [(1, xs, ys)], 3.0)
    assert got[1] == serial(xs, ys, 3.0)

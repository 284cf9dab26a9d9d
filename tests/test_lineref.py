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

"""grid_invdistnn vs a serial transcription of
GDALGridInverseDistanceToAPowerNearestNeighbor (gdalgrid.cpp:241):
sorted-ascending accumulation, max_points cap, min_points gate,
smoothing, exact-hit shortcut."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels.cells import TileGrid
from gdal_spark.operators.grid_interp import grid_invdistnn

GRID = TileGrid.local(0.0, 0.0, 16.0, 16.0)
Z = 2          # 4x4 cells, span 4
TS = GRID.tile_span(Z)


def _serial(pts, radius_cells, power, smoothing, max_points, min_points):
    """Reference loop: per cell, radius filter on REAL d2, sort by
    smoothed r2, accumulate the closest max_points in order."""
    out = {}
    r2max = float(radius_cells * TS) ** 2
    s2 = smoothing * smoothing
    n = 1 << Z
    for ctx in range(n):
        for cty in range(n):
            cx = GRID.top_left_x + (ctx + 0.5) * TS
            cy = GRID.top_left_y - (cty + 0.5) * TS
            cand = []
            hit = None
            for pid, x, y, v in pts:
                d2 = (x - cx) ** 2 + (y - cy) ** 2
                rs2 = d2 + s2
                if rs2 < 1e-13:
                    if hit is None:
                        hit = v
                    continue
                if d2 <= r2max:
                    cand.append((rs2, v, pid))
            if hit is not None:
                out[(ctx, cty)] = (hit, 0)
                continue
            cand.sort()
            nom = den = 0.0
            used = 0
            for rs2, v, _ in cand[:max_points] if max_points > 0 else cand:
                inv = 1.0 / math.pow(rs2, power / 2.0)
                nom += inv * v
                den += inv
                used += 1
            if used >= min_points and den != 0.0:
                out[(ctx, cty)] = (nom / den, used)
    return out


PTS = [(i, (i * 37 % 97) / 97.0 * 16.0, (i * 59 % 89) / 89.0 * 16.0,
        float(i * 7 % 23)) for i in range(40)]


def _run(spark, **kw):
    df = spark.createDataFrame(PTS, "pid long, x double, y double, v double")
    out = grid_invdistnn(df, GRID, Z, **kw)
    return {(r["ctx"], r["cty"]): (r["idwnn"], r["n_used"])
            for r in out.collect()}


@pytest.mark.parametrize("kw", [
    dict(radius_cells=1, power=2.0, smoothing=0.0, max_points=5),
    dict(radius_cells=1, power=3.0, smoothing=0.25, max_points=3),
    dict(radius_cells=2, power=2.0, smoothing=0.0, max_points=0),
    dict(radius_cells=1, power=2.0, smoothing=0.0, max_points=4,
         min_points=3),
])
def test_matches_serial(spark, kw):
    got = _run(spark, **kw)
    want = _serial(PTS, kw["radius_cells"], kw["power"], kw["smoothing"],
                   kw["max_points"], kw.get("min_points", 0))
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], k
        if kw["power"] == 2.0:
            # integer exponent: pow is exact in both runtimes, and
            # the ordered fold reproduces the serial sum bit-for-bit
            assert got[k][0] == want[k][0], k
        else:
            # fractional exponents: Java Math.pow is 1-ulp accurate,
            # C libm pow is correctly rounded — allow the ulp
            assert got[k][0] == pytest.approx(want[k][0], rel=1e-14), k


def test_exact_hit_shortcut(spark):
    cx = GRID.top_left_x + 0.5 * TS
    cy = GRID.top_left_y - 0.5 * TS
    pts = [(0, cx, cy, 42.0), (1, cx + 1.0, cy, 7.0)]
    df = spark.createDataFrame(pts, "pid long, x double, y double, v double")
    out = {(r["ctx"], r["cty"]): r["idwnn"]
           for r in grid_invdistnn(df, GRID, Z).collect()}
    assert out[(0, 0)] == 42.0


def test_min_points_suppresses_cells(spark):
    # one isolated point (off every cell center): every cell it
    # reaches has exactly 1 neighbor
    df = spark.createDataFrame([(0, 2.5, 14.3, 5.0)],
                               "pid long, x double, y double, v double")
    assert grid_invdistnn(df, GRID, Z, min_points=2).count() == 0
    assert grid_invdistnn(df, GRID, Z, min_points=1).count() > 0

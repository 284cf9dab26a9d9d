"""Distributed tiled Delaunay (operators/delaunay_dist.py): facet-set
equality with the driver kernel across point distributions, the
Euler completeness certificate, the patch machinery, and the
grid_linear tiled engine."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels.cells import TileGrid
from gdal_spark.kernels.delaunay import delaunay_triangles
from gdal_spark.operators.delaunay_dist import delaunay_tiled
from gdal_spark.operators.grid_interp import grid_linear, grid_linear_tiled


def _df(spark, xs, ys):
    return spark.createDataFrame(
        [(i, float(xs[i]), float(ys[i])) for i in range(len(xs))],
        "pid long, x double, y double")


def _tiled_set(spark, xs, ys, **kw):
    return {tuple(r) for r in
            delaunay_tiled(_df(spark, xs, ys), **kw).collect()}


def _ref_set(xs, ys):
    return {tuple(sorted((i, j, k)))
            for i, j, k in delaunay_triangles(xs, ys)}


@pytest.mark.parametrize("dist,seed,n", [
    ("uniform", 42, 2500),
    ("blobs", 7, 2400),
    ("strip", 3, 2000),
])
def test_tiled_matches_driver(spark, dist, seed, n):
    rng = np.random.default_rng(seed)
    if dist == "uniform":
        xs = rng.uniform(0, 1000, n)
        ys = rng.uniform(0, 1000, n)
    elif dist == "blobs":
        cs = rng.uniform(100, 900, (6, 2))
        pts = np.concatenate(
            [c + rng.normal(0, 15, (n // 6, 2)) for c in cs])
        xs, ys = pts[:, 0], pts[:, 1]
    else:
        xs = rng.uniform(0, 5000, n)
        ys = rng.uniform(0, 40, n)
    # target_per_tile forced low so the run exercises multiple tiles,
    # ownership dedup, certification, and the verified patch
    got = _tiled_set(spark, xs, ys, target_per_tile=400)
    assert got == _ref_set(xs, ys)


def test_small_input_uses_driver_path(spark):
    rng = np.random.default_rng(1)
    xs = rng.uniform(0, 10, 40)
    ys = rng.uniform(0, 10, 40)
    got = _tiled_set(spark, xs, ys)       # n <= target_per_tile
    assert got == _ref_set(xs, ys)
    assert delaunay_tiled(
        _df(spark, xs[:2], ys[:2])).count() == 0


def test_euler_certificate_rejects_duplicates(spark):
    rng = np.random.default_rng(5)
    xs = np.concatenate([rng.uniform(0, 100, 600)] * 2)
    ys = np.concatenate([rng.uniform(0, 100, 600)] * 2)
    with pytest.raises(ValueError, match="certificate|degenerate"):
        delaunay_tiled(_df(spark, xs, ys), target_per_tile=300,
                       verify=True).count()


def test_grid_linear_tiled_matches_driver_engine(spark):
    rng = np.random.default_rng(11)
    n = 1200
    pts = spark.createDataFrame(
        [(i, float(x), float(y), float(v)) for i, (x, y, v) in
         enumerate(zip(rng.uniform(0, 16, n), rng.uniform(0, 16, n),
                       rng.uniform(0, 255, n)))],
        "pid long, x double, y double, v double")
    grid = TileGrid.local(0.0, 0.0, 16.0, 16.0)
    a = {(r["ctx"], r["cty"]): (round(r["linear"], 9), r["in_hull"])
         for r in grid_linear(pts, grid, 4).collect()}
    b = {(r["ctx"], r["cty"]): (round(r["linear"], 9), r["in_hull"])
         for r in grid_linear_tiled(pts, grid, 4,
                                    target_per_tile=300).collect()}
    assert a == b

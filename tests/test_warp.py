"""Warp: Column reprojection matches the numpy kernels; tile warp is
tile-split invariant vs a direct numpy warp of the assembled array."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gdal_spark.kernels import geom as kgeom
from gdal_spark.kernels.cells import TileGrid
from gdal_spark.operators.warp import reproject_points, warp_tiles


def test_point_reprojection_matches_kernel(spark):
    import pyspark.sql.functions as F

    df = spark.range(300).select(
        ((F.col("id") % 360) - 180 + 0.25).alias("lon"),
        ((F.col("id") % 170) - 85 + 0.5).alias("lat"),
    )
    rows = reproject_points(df, "lon", "lat", "to_mercator").collect()
    for r in rows:
        kx, ky = kgeom.lonlat_to_mercator(r["lon"], r["lat"])
        assert abs(r["lon_out"] - float(kx)) < 1e-6
        assert abs(r["lat_out"] - float(ky)) < 1e-6

    back = reproject_points(
        reproject_points(df, "lon", "lat", "to_mercator")
        .select(F.col("lon_out").alias("x"), F.col("lat_out").alias("y"),
                "lon", "lat"),
        "x", "y", "to_lonlat").collect()
    for r in back:
        assert abs(r["x_out"] - r["lon"]) < 1e-9
        assert abs(r["y_out"] - r["lat"]) < 1e-7


TS, N = 16, 2


def _src():
    rng = np.random.RandomState(21)
    return rng.randint(1, 255, size=(N * TS, N * TS)).astype(np.uint8)


def _tiles_df(spark, arr):
    rows = [
        {"tx": tx, "ty": ty,
         "px": bytearray(arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
                         .tobytes())}
        for ty in range(N) for tx in range(N)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_warp_identity_regrid(spark):
    """Regrid to a shifted/scaled grid in the same CRS — every output
    pixel must equal the nearest source pixel of the assembled array."""
    src = _src()
    src_grid = TileGrid(0.0, 32.0, 32.0, TS)          # src: 32x32 world units
    dst_grid = TileGrid(4.0, 30.0, 16.0, TS)          # zoomed window, res 0.5x
    out = warp_tiles(_tiles_df(spark, src), src_grid, 1, dst_grid, 1,
                     direction="identity",
                     src_tile_size=TS, dst_tile_size=TS).collect()
    assert len(out) == 4
    sres = src_grid.resolution(1)
    for r in out:
        got = np.frombuffer(r["px"], dtype=np.uint8).reshape(TS, TS)
        minx, miny, maxx, maxy = dst_grid.tile_bounds(1, r["tx"], r["ty"])
        res = dst_grid.resolution(1)
        cx = minx + (np.arange(TS) + 0.5) * res
        cy = maxy - (np.arange(TS) + 0.5) * res
        gx, gy = np.meshgrid(cx, cy)
        spx = np.floor((gx - src_grid.top_left_x) / sres).astype(int)
        spy = np.floor((src_grid.top_left_y - gy) / sres).astype(int)
        want = np.zeros_like(got)
        m = (spx >= 0) & (spx < src.shape[1]) & (spy >= 0) & (spy < src.shape[0])
        want[m] = src[spy[m], spx[m]]
        np.testing.assert_array_equal(got, want)


def test_warp_mercator(spark):
    """EPSG:4326 source -> EPSG:3857 destination grid."""
    src = _src()
    # source: lon/lat window [0,32]x[0,32] degrees
    src_grid = TileGrid(0.0, 32.0, 32.0, TS)
    # dst: mercator window covering the same area
    x0, _ = kgeom.lonlat_to_mercator(0.0, 0.0)
    x1, y1 = kgeom.lonlat_to_mercator(32.0, 32.0)
    dst_grid = TileGrid(float(x0), float(y1), float(x1 - x0), TS)
    out = warp_tiles(_tiles_df(spark, src), src_grid, 1, dst_grid, 1,
                     direction="dst_merc_src_ll",
                     src_tile_size=TS, dst_tile_size=TS).collect()
    assert len(out) == 4
    vals = np.concatenate([
        np.frombuffer(r["px"], dtype=np.uint8) for r in out])
    # warped output draws from the source's value set (nearest sampling)
    assert set(np.unique(vals)) <= set(np.unique(src)) | {0}
    assert (vals > 0).mean() > 0.9

"""gdal_rasterize -i (invert) + gdal2xyz export semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gdal_spark.kernels import wkb as kwkb
from gdal_spark.kernels.cells import TileGrid
from gdal_spark.operators.raster_tile import rasterize_tiles, xyz_rows


def _point_geoms(spark, pts):
    rows = [{"fid": i, "wkb": kwkb.wkb_point(x, y),
             "xmin": x, "ymin": y, "xmax": x, "ymax": y}
            for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_invert_burns_complement_and_empty_tiles(spark):
    # one point in the top-left tile only; zoom 1 -> 4 tiles of 4x4
    grid = TileGrid(0.0, 8.0, 8.0, tile_size=4)
    geoms = _point_geoms(spark, [(0.5, 7.5)])
    tiles = {(r["tx"], r["ty"]): np.frombuffer(r["px"], np.uint8)
             .reshape(4, 4)
             for r in rasterize_tiles(geoms, grid, 1, burn=9.0,
                                      tile_size=4, invert=True).collect()}
    assert set(tiles) == {(0, 0), (0, 1), (1, 0), (1, 1)}   # full universe
    assert tiles[(0, 0)][0, 0] == 0                          # covered px
    assert tiles[(0, 0)].sum() == 9 * 15                     # rest burned
    for k in [(0, 1), (1, 0), (1, 1)]:
        assert (tiles[k] == 9).all()                         # empty tiles


def test_invert_false_unchanged(spark):
    grid = TileGrid(0.0, 8.0, 8.0, tile_size=4)
    geoms = _point_geoms(spark, [(0.5, 7.5)])
    out = rasterize_tiles(geoms, grid, 1, burn=9.0, tile_size=4).collect()
    assert len(out) == 1           # only the covered tile materializes
    a = np.frombuffer(out[0]["px"], np.uint8).reshape(4, 4)
    assert a[0, 0] == 9 and a.sum() == 9


def test_xyz_rows_centers_and_skip(spark):
    grid = TileGrid(10.0, 20.0, 8.0, tile_size=4)   # zoom 0: res 2
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    tiles = spark.createDataFrame(
        [(0, 0, 0, 1, a.tobytes(), 0)],
        "z int, tx long, ty long, band int, px binary, checksum long")
    rows = xyz_rows(tiles, grid, 0, tile_size=4, skip_value=0.0).collect()
    assert len(rows) == 15                           # v=0 skipped
    got = {(r["x"], r["y"]): r["v"] for r in rows}
    # pixel (row=0, col=1) has v=1, center x = 10 + 1.5*2, y = 20 - 0.5*2
    assert got[(13.0, 19.0)] == 1.0
    # last pixel (row=3, col=3) v=15, x = 10 + 3.5*2 = 17, y = 20 - 7 = 13
    assert got[(17.0, 13.0)] == 15.0

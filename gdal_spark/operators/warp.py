"""Warp / reproject: coordinate transforms + raster tile warping.

The reference's warper is a transformer chain + resampling kernel
over memory-bounded chunks (/root/reference/alg/gdaltransformer.cpp:
96-159, /root/reference/alg/gdalwarpkernel.cpp,
/root/reference/alg/gdalwarpoperation.cpp:927-1267).  v1 supports the
EPSG:4326 <-> 3857 pair (SURVEY non-goals bound the SRS catalog):

* point reprojection is PURE Column math — the spherical-mercator
  formulas compile into whole-stage codegen (no UDF at all), exactly
  like OGRCoordinateTransformation's array API vectorizes
  (/root/reference/ogr/ogrct.cpp:2264);
* tile warping inverts the reference's chunk loop: per OUTPUT tile,
  back-project the pixel-center grid into source coordinates, gather
  the source tiles that cover the back-projected bbox (covering-cell
  explode, the same fan-out as rasterize), and sample nearest-
  neighbor inside one applyInPandas group per output tile.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .. import functions as gf
from ..kernels import checksum as kck
from ..kernels import geom as kgeom
from ..kernels.cells import TileGrid

R_MERC = 6378137.0

OUT_SCHEMA = "tx long, ty long, px binary, checksum long"


# ---- Column-level point reprojection ------------------------------------
def lonlat_to_mercator_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    """Spherical web-mercator forward — Column twin of
    kernels.geom.lonlat_to_mercator (same formula order)."""
    x = F.lit(R_MERC) * F.radians(lon)
    y = F.lit(R_MERC) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0)))
    return x, y


def mercator_to_lonlat_cols(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / F.lit(R_MERC))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(y / F.lit(R_MERC))) - F.lit(math.pi / 2.0))
    return lon, lat


def reproject_points(df: DataFrame, x_col: str, y_col: str,
                     direction: str = "to_mercator") -> DataFrame:
    if direction == "to_mercator":
        x, y = lonlat_to_mercator_cols(F.col(x_col), F.col(y_col))
    else:
        x, y = mercator_to_lonlat_cols(F.col(x_col), F.col(y_col))
    return df.withColumn(f"{x_col}_out", x).withColumn(f"{y_col}_out", y)


# ---- tile warp -----------------------------------------------------------
def warp_tiles(src_tiles: DataFrame, src_grid: TileGrid, src_zoom: int,
               dst_grid: TileGrid, dst_zoom: int,
               direction: str = "identity", dtype: str = "uint8",
               src_tile_size: int | None = None,
               dst_tile_size: int | None = None,
               nodata: float = 0.0) -> DataFrame:
    """Warp a tiled raster from src_grid to dst_grid, nearest-neighbor.

    direction: how dst world coords map to src world coords —
    'identity' (same CRS, regridding/resampling), 'dst_merc_src_ll'
    (dst is EPSG:3857, src EPSG:4326), or 'dst_ll_src_merc'.
    """
    np_dtype = np.dtype(dtype)
    sts = src_tile_size or src_grid.tile_size
    dts = dst_tile_size or dst_grid.tile_size

    def to_src(xs, ys):
        if direction == "identity":
            return xs, ys
        if direction == "dst_merc_src_ll":
            return kgeom.mercator_to_lonlat(xs, ys)
        if direction == "dst_ll_src_merc":
            return kgeom.lonlat_to_mercator(xs, ys)
        raise ValueError(direction)

    # enumerate destination tiles covering the source extent: project
    # the source tiles' bboxes into dst coords and explode dst cells
    def _dst_of_src(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                minx, miny, maxx, maxy = src_grid.tile_bounds(
                    src_zoom, int(r["tx"]), int(r["ty"]))
                # map src bbox corners to dst world coords
                if direction == "identity":
                    dminx, dminy, dmaxx, dmaxy = minx, miny, maxx, maxy
                elif direction == "dst_merc_src_ll":
                    xs, ys = kgeom.lonlat_to_mercator(
                        np.array([minx, maxx]), np.array([miny, maxy]))
                    dminx, dmaxx = float(xs[0]), float(xs[1])
                    dminy, dmaxy = float(ys[0]), float(ys[1])
                else:
                    lon, lat = kgeom.mercator_to_lonlat(
                        np.array([minx, maxx]), np.array([miny, maxy]))
                    dminx, dmaxx = float(lon[0]), float(lon[1])
                    dminy, dmaxy = float(lat[0]), float(lat[1])
                tx0, ty0, tx1, ty1 = dst_grid.tile_range_for_bbox(
                    dst_zoom, dminx, dminy, dmaxx, dmaxy)
                for dty in range(ty0, ty1 + 1):
                    for dtx in range(tx0, tx1 + 1):
                        rows.append((dtx, dty, int(r["tx"]), int(r["ty"]),
                                     r["px"]))
            yield pd.DataFrame(
                rows, columns=["dtx", "dty", "stx", "sty", "px"])

    fanout = src_tiles.select("tx", "ty", "px").mapInPandas(
        _dst_of_src, "dtx long, dty long, stx long, sty long, px binary")

    sres = src_grid.resolution(src_zoom)
    stlx, stly = src_grid.top_left_x, src_grid.top_left_y

    def _warp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dtx, dty = int(key[0]), int(key[1])
        # back-project the dst tile's pixel centers
        minx, miny, maxx, maxy = dst_grid.tile_bounds(dst_zoom, dtx, dty)
        res = dst_grid.resolution(dst_zoom)
        cx = minx + (np.arange(dts) + 0.5) * res
        cy = maxy - (np.arange(dts) + 0.5) * res
        gx, gy = np.meshgrid(cx, cy)
        sx, sy = to_src(gx.ravel(), gy.ravel())
        # global source pixel indices
        spx = np.floor((sx - stlx) / sres).astype(np.int64)
        spy = np.floor((stly - sy) / sres).astype(np.int64)
        out = np.full(dts * dts, nodata, dtype=np.float64)
        for _, r in pdf.iterrows():
            arr = np.frombuffer(r["px"], dtype=np_dtype).reshape(sts, sts)
            x0, y0 = int(r["stx"]) * sts, int(r["sty"]) * sts
            m = ((spx >= x0) & (spx < x0 + sts)
                 & (spy >= y0) & (spy < y0 + sts))
            out[m] = arr[spy[m] - y0, spx[m] - x0]
        res_arr = out.astype(np_dtype).reshape(dts, dts)
        return pd.DataFrame({
            "tx": [dtx], "ty": [dty], "px": [res_arr.tobytes()],
            "checksum": [kck.checksum(res_arr.astype(np.int64))],
        })

    return fanout.groupBy("dtx", "dty").applyInPandas(_warp, OUT_SCHEMA)

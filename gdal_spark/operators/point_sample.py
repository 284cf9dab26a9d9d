"""Raster x vector point sampling: value of a tiled raster at point
locations — the 'as-of in space' join.

Semantics target: GDALInterpolateAtPoint near/bilinear
(/root/reference/alg/gdal_interpolateatpoint.cpp:415; CLI
/root/reference/apps/gdallocationinfo.cpp).  Pixel centers sit at
(i + 0.5); bilinear samples the 2x2 center neighborhood of
(gx - 0.5, gy - 0.5) with fractional weights.

Distributed shape: points map to their tile by pure Column math; the
tiles are assembled WITH a 1-px halo (same border-strip exchange as
the focal operators) so bilinear reads that straddle a tile border
see real neighbor pixels; points and padded tiles meet in a cogroup
keyed by (tx, ty) — one shuffle each side, numpy sampling per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import functions as gf
from ..kernels.cells import TileGrid
from .focal import _OFFSETS, _PARTS

SAMPLE_SCHEMA = "pid long, value double"
_PS_HALO_SCHEMA = "dtx long, dty long, part string, payload binary"


def _padded_tiles(tiles: DataFrame, np_dtype, ts: int) -> DataFrame:
    """(tx, ty, padded binary): each tile with its 1-px neighbor halo
    (NaN where no neighbor exists — dataset edge)."""

    def _emit(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["px"], dtype=np_dtype).reshape(ts, ts)
                for part, (src, _dst) in _PARTS.items():
                    dx, dy = _OFFSETS[part]
                    rows.append((int(r["tx"]) + dx, int(r["ty"]) + dy,
                                 part, arr[src].tobytes()))
            yield pd.DataFrame(rows, columns=["dtx", "dty", "part", "payload"])

    halo = tiles.select("tx", "ty", "px").mapInPandas(
        _emit, _PS_HALO_SCHEMA)

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = dict(zip(pdf["part"], pdf["payload"]))
        if "c" not in parts:
            return pd.DataFrame([], columns=["tx", "ty", "padded"])
        padded = np.full((ts + 2, ts + 2), np.nan, dtype=np.float64)
        for part, raw in parts.items():
            _src, dst = _PARTS[part]
            padded[dst] = np.frombuffer(raw, dtype=np_dtype).reshape(
                padded[dst].shape)
        return pd.DataFrame({
            "tx": [int(key[0])], "ty": [int(key[1])],
            "padded": [padded.tobytes()],
        })

    return halo.groupBy("dtx", "dty").applyInPandas(
        _assemble, "tx long, ty long, padded binary")


def sample_tiles(tiles: DataFrame, points: DataFrame, grid: TileGrid,
                 zoom: int, method: str = "near", dtype: str = "uint8",
                 tile_size: int | None = None) -> DataFrame:
    """Sample the tiled raster at point locations.

    points: DF(pid bigint, x double, y double).  Returns (pid, value)
    — NaN-free only where the point lands on an existing tile.
    """
    ts = tile_size or grid.tile_size
    np_dtype = np.dtype(dtype)
    res = grid.resolution(zoom)

    tx, ty = gf.tile_xy_cols(grid, zoom, F.col("x"), F.col("y"))
    pts = points.withColumn("tx", tx).withColumn("ty", ty)
    padded = _padded_tiles(tiles, np_dtype, ts)

    tlx, tly = grid.top_left_x, grid.top_left_y

    def _sample(key, pts_pdf: pd.DataFrame, tile_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pts_pdf) == 0 or len(tile_pdf) == 0:
            return pd.DataFrame([], columns=["pid", "value"])
        txv, tyv = int(key[0]), int(key[1])
        padded_arr = np.frombuffer(
            tile_pdf.iloc[0]["padded"], dtype=np.float64
        ).reshape(ts + 2, ts + 2)
        # global pixel coords -> local coords inside the padded array
        gx = (pts_pdf["x"].to_numpy() - tlx) / res - txv * ts
        gy = (tly - pts_pdf["y"].to_numpy()) / res - tyv * ts
        if method == "near":
            ix = np.floor(gx).astype(np.int64)
            iy = np.floor(gy).astype(np.int64)
            vals = padded_arr[iy + 1, ix + 1]
        else:  # bilinear on pixel centers (interpolateatpoint semantics)
            sx = gx - 0.5
            sy = gy - 0.5
            x0 = np.floor(sx).astype(np.int64)
            y0 = np.floor(sy).astype(np.int64)
            fx = sx - x0
            fy = sy - y0
            p = padded_arr
            v00 = p[y0 + 1, x0 + 1]
            v01 = p[y0 + 1, x0 + 2]
            v10 = p[y0 + 2, x0 + 1]
            v11 = p[y0 + 2, x0 + 2]
            vals = ((1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v01
                    + (1 - fx) * fy * v10 + fx * fy * v11)
        return pd.DataFrame({"pid": pts_pdf["pid"].to_numpy(), "value": vals})

    return (
        pts.groupBy("tx", "ty")
        .cogroup(padded.groupBy("tx", "ty"))
        .applyInPandas(_sample, SAMPLE_SCHEMA)
    )

"""Distributed viewshed / line-of-sight over tiled DEMs.

The reference computes one viewshed per gdal_viewshed invocation with
a serial reference-plane sweep (alg/viewshed/viewshed_executor.cpp) —
the recurrence is radially sequential, so ONE observer's window is not
profitably parallel.  The scale axis on a cluster is ACROSS observers
(tower/sensor batches): each observer's covering tiles are gathered
with a JVM equi-join on tile coordinates (the same covering-cell
fan-out as point_sample/warp), then one Arrow group per observer runs
the bit-faithful serial kernel.  10^5 observers => 10^5 independent
tasks; the DEM tile table streams from parquet, only the tiles inside
some observer's radius shuffle (semi-join pruning), and a tile shared
by k observers is shipped k times (bounded by (2r/ts+1)^2 per
observer, no driver materialization anywhere).

Line of sight (alg/los.cpp GDALIsLineOfSightVisible) batches the same
way over (A, B) point pairs with the pair's bbox as its window.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels import checksum as kck
from ..kernels import viewshed as kvs

VS_SCHEMA = ("oid long, x0 long, y0 long, w int, h int, "
             "vis binary, visible_count long, checksum long")
LOS_SCHEMA = "pid long, visible boolean, ix long, iy long"


def _tile_range(col_px, radius, ts):
    lo = F.floor((col_px - radius) / ts).cast("long")
    hi = F.floor((col_px + radius) / ts).cast("long")
    return F.explode(F.sequence(lo, hi))


def viewshed_points(tiles: DataFrame, observers: DataFrame,
                    tile_size: int = 256, radius_px: int = 128,
                    dtype: str = "uint8", observer_z: float = 0.0,
                    target_height: float = 0.0, cell_mode: str = "edge",
                    raster_w: int | None = None,
                    raster_h: int | None = None) -> DataFrame:
    """Per-observer visibility windows.

    tiles: (tx, ty, px) DEM tiles; observers: (oid, px, py) global
    pixel coords.  The output window is the radius square clipped to
    [0, raster_w) x [0, raster_h) (pass the DEM extent; defaults to
    clipping only at 0), matching gdal_viewshed's oOutExtent clamp.
    """
    np_dtype = np.dtype(dtype)
    ts = tile_size

    obs = observers.select(
        "oid", "px", "py",
        _tile_range(F.col("px"), radius_px, ts).alias("tx"),
    ).select(
        "oid", "px", "py", "tx",
        _tile_range(F.col("py"), radius_px, ts).alias("ty"),
    )
    fan = obs.join(tiles.select("tx", "ty", F.col("px").alias("tile_px")),
                   on=["tx", "ty"])

    def _run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        oid = int(key[0])
        opx, opy = int(pdf["px"].iloc[0]), int(pdf["py"].iloc[0])
        x0, y0 = opx - radius_px, opy - radius_px
        x1, y1 = opx + radius_px, opy + radius_px
        x0, y0 = max(0, x0), max(0, y0)
        if raster_w is not None:
            x1 = min(raster_w - 1, x1)
        if raster_h is not None:
            y1 = min(raster_h - 1, y1)
        w, h = x1 - x0 + 1, y1 - y0 + 1
        canvas = np.zeros((h, w), dtype=np.float64)
        for _, r in pdf.iterrows():
            arr = np.frombuffer(r["tile_px"], dtype=np_dtype).reshape(ts, ts)
            tx0, ty0 = int(r["tx"]) * ts, int(r["ty"]) * ts
            ax0, ax1 = max(tx0, x0), min(tx0 + ts - 1, x1)
            ay0, ay1 = max(ty0, y0), min(ty0 + ts - 1, y1)
            if ax0 > ax1 or ay0 > ay1:
                continue
            canvas[ay0 - y0:ay1 - y0 + 1, ax0 - x0:ax1 - x0 + 1] = \
                arr[ay0 - ty0:ay1 - ty0 + 1, ax0 - tx0:ax1 - tx0 + 1]
        vis = kvs.viewshed(canvas, opx - x0, opy - y0,
                           observer_z=observer_z,
                           target_height=target_height,
                           cell_mode=cell_mode)
        return pd.DataFrame({
            "oid": [oid], "x0": [x0], "y0": [y0], "w": [w], "h": [h],
            "vis": [vis.tobytes()],
            "visible_count": [int((vis != 0).sum())],
            "checksum": [kck.checksum(vis)],
        })

    return fan.groupBy("oid").applyInPandas(_run, VS_SCHEMA)


def los_pairs(tiles: DataFrame, pairs: DataFrame,
              tile_size: int = 256, dtype: str = "uint8") -> DataFrame:
    """Batch GDALIsLineOfSightVisible over (pid, xa, ya, za, xb, yb,
    zb) pairs; each pair gathers the tiles covering its bbox."""
    np_dtype = np.dtype(dtype)
    ts = tile_size

    p = pairs.select(
        "pid", "xa", "ya", "za", "xb", "yb", "zb",
        F.explode(F.sequence(
            F.floor(F.least("xa", "xb") / ts).cast("long"),
            F.floor(F.greatest("xa", "xb") / ts).cast("long"))).alias("tx"),
    ).select(
        "*",
        F.explode(F.sequence(
            F.floor(F.least("ya", "yb") / ts).cast("long"),
            F.floor(F.greatest("ya", "yb") / ts).cast("long"))).alias("ty"),
    )
    fan = p.join(tiles.select("tx", "ty", F.col("px").alias("tile_px")),
                 on=["tx", "ty"])

    def _run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        r0 = pdf.iloc[0]
        xa, ya, xb, yb = (int(r0["xa"]), int(r0["ya"]),
                          int(r0["xb"]), int(r0["yb"]))
        x0, y0 = min(xa, xb), min(ya, yb)
        w, h = abs(xb - xa) + 1, abs(yb - ya) + 1
        canvas = np.zeros((h, w), dtype=np.float64)
        for _, r in pdf.iterrows():
            arr = np.frombuffer(r["tile_px"], dtype=np_dtype).reshape(ts, ts)
            tx0, ty0 = int(r["tx"]) * ts, int(r["ty"]) * ts
            ax0, ax1 = max(tx0, x0), min(tx0 + ts - 1, x0 + w - 1)
            ay0, ay1 = max(ty0, y0), min(ty0 + ts - 1, y0 + h - 1)
            if ax0 > ax1 or ay0 > ay1:
                continue
            canvas[ay0 - y0:ay1 - y0 + 1, ax0 - x0:ax1 - x0 + 1] = \
                arr[ay0 - ty0:ay1 - ty0 + 1, ax0 - tx0:ax1 - tx0 + 1]
        ok, ix, iy = kvs.line_of_sight(
            canvas, xa - x0, ya - y0, float(r0["za"]),
            xb - x0, yb - y0, float(r0["zb"]))
        return pd.DataFrame({
            "pid": [int(key[0])], "visible": [ok],
            "ix": [ix if ix < 0 else ix + x0],
            "iy": [iy if iy < 0 else iy + y0],
        })

    return fan.groupBy("pid").applyInPandas(_run, LOS_SCHEMA)

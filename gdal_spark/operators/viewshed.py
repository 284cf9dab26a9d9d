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
                    raster_h: int | None = None,
                    out_mode: str = "normal", curve_coeff: float = 0.0,
                    semi_major: float = 6378137.0, cell_sx: float = 1.0,
                    cell_sy: float = 1.0,
                    max_distance: float = 0.0) -> DataFrame:
    """Per-observer visibility windows.

    tiles: (tx, ty, px) DEM tiles; observers: (oid, px, py) global
    pixel coords.  The output window is the radius square clipped to
    [0, raster_w) x [0, raster_h) (pass the DEM extent; defaults to
    clipping only at 0), matching gdal_viewshed's oOutExtent clamp.

    out_mode "normal" emits a uint8 mask; "dem"/"ground" emit float64
    required-elevation windows (viewshed_executor.cpp setOutput
    :179-192); curve_coeff/semi_major/cell_sx/cell_sy enable the
    curved-earth height adjustment (:150-171, :268-316);
    visible_count counts visible cells (mask != 0 in normal mode,
    required height == 0 otherwise).
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
    # LEFT join: sparse tile tables (rasterized layers only
    # materialize touched tiles) must not drop an observer whose
    # window is partly/fully empty — missing tiles read as 0, the
    # same contract as reading an unwritten region of a raster
    fan = obs.join(tiles.select("tx", "ty", F.col("px").alias("tile_px")),
                   on=["tx", "ty"], how="left")

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
            if r["tile_px"] is None:
                continue
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
                           cell_mode=cell_mode, out_mode=out_mode,
                           curve_coeff=curve_coeff, semi_major=semi_major,
                           cell_sx=cell_sx, cell_sy=cell_sy,
                           max_distance=max_distance)
        n_vis = int((vis != 0).sum() if out_mode == "normal"
                    else (vis == 0).sum())
        return pd.DataFrame({
            "oid": [oid], "x0": [x0], "y0": [y0], "w": [w], "h": [h],
            "vis": [vis.tobytes()],
            "visible_count": [n_vis],
            "checksum": [kck.checksum(vis)],
        })

    return fan.groupBy("oid").applyInPandas(_run, VS_SCHEMA)


def _line_tiles(xa: int, ya: int, xb: int, yb: int, ts: int):
    """Tile keys whose pixels can appear on the Bresenham walk from A
    to B: the exact segment padded by 1 px covers every walk cell
    (the walk never strays further from the ideal line), so per
    crossed tile-row band take the segment's x-interval +-1."""
    ty0, ty1 = sorted((ya // ts, yb // ts))
    out = set()
    for ty in range(ty0, ty1 + 1):
        if ya == yb:
            seg = (min(xa, xb), max(xa, xb))
        else:
            # band's pixel-row extent padded by 1 (a shallow walk can
            # enter the band one row early/late), clipped to the
            # segment, then solved for the ideal x at both ends
            ry0 = max(ty * ts - 1, min(ya, yb))
            ry1 = min(ty * ts + ts, max(ya, yb))
            t0 = (ry0 - ya) / (yb - ya)
            t1 = (ry1 - ya) / (yb - ya)
            xs = (xa + t0 * (xb - xa), xa + t1 * (xb - xa))
            seg = (min(xs), max(xs))
        lo = int(np.floor(seg[0] - 1)) // ts
        hi = int(np.floor(seg[1] + 1)) // ts
        for tx in range(lo, hi + 1):
            out.add((tx, ty))
    return out


def los_pairs(tiles: DataFrame, pairs: DataFrame,
              tile_size: int = 256, dtype: str = "uint8") -> DataFrame:
    """Batch GDALIsLineOfSightVisible over (pid, xa, ya, za, xb, yb,
    zb) pairs.  Each pair gathers only the tiles its sight line
    CROSSES (1-px-padded segment supercover) — O(line length / ts)
    tiles per pair, never the bbox — and terrain lookups go through a
    per-tile dict, so a long diagonal line over a continental raster
    ships kilobytes, not the O(length^2) bounding canvas."""
    np_dtype = np.dtype(dtype)
    ts = tile_size

    def _fan(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for tx, ty in sorted(_line_tiles(
                        int(r["xa"]), int(r["ya"]), int(r["xb"]),
                        int(r["yb"]), ts)):
                    rows.append((int(r["pid"]), int(r["xa"]), int(r["ya"]),
                                 float(r["za"]), int(r["xb"]), int(r["yb"]),
                                 float(r["zb"]), tx, ty))
            yield pd.DataFrame(rows, columns=[
                "pid", "xa", "ya", "za", "xb", "yb", "zb", "tx", "ty"])

    p = pairs.select("pid", "xa", "ya", "za", "xb", "yb", "zb").mapInPandas(
        _fan, "pid long, xa long, ya long, za double, "
              "xb long, yb long, zb double, tx long, ty long")
    fan = p.join(tiles.select("tx", "ty", F.col("px").alias("tile_px")),
                 on=["tx", "ty"], how="left")

    def _run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        r0 = pdf.iloc[0]
        xa, ya, xb, yb = (int(r0["xa"]), int(r0["ya"]),
                          int(r0["xb"]), int(r0["yb"]))
        cache = {(int(r["tx"]), int(r["ty"])):
                 np.frombuffer(r["tile_px"], dtype=np_dtype).reshape(ts, ts)
                 for _, r in pdf.iterrows() if r["tile_px"] is not None}

        class _TileDEM:
            """dict-backed 2D view: missing tiles read as 0 terrain
            (same contract as the previous dense-canvas fill)."""
            def __getitem__(self, yx):
                y, x = yx
                arr = cache.get((x // ts, y // ts))
                return 0.0 if arr is None else float(arr[y % ts, x % ts])

        ok, ix, iy = kvs.line_of_sight(
            _TileDEM(), xa, ya, float(r0["za"]), xb, yb, float(r0["zb"]))
        return pd.DataFrame({
            "pid": [int(key[0])], "visible": [ok],
            "ix": [ix], "iy": [iy],
        })

    return fan.groupBy("pid").applyInPandas(_run, LOS_SCHEMA)


CUM_SCHEMA = "tx long, ty long, px binary, tile_max long"


def cumulative_viewshed(tiles: DataFrame, raster_w: int, raster_h: int,
                        spacing: int, tile_size: int = 256,
                        radius_px: int | None = None,
                        dtype: str = "uint8", observer_z: float = 0.0,
                        cell_mode: str = "edge") -> DataFrame:
    """Cumulative viewshed (alg/viewshed/cumulative.cpp): observers on
    an every-``spacing``-pixels grid each run a Normal-mode viewshed
    with visible=1 (:46-47, :64-68); per-pixel uint32 sums over the
    FULL raster extent; then the 8-bit rescale
    ``floor(255/max * v)`` (scaleOutput :200-213, max==0 -> no-op).

    Scale shape — the reference's executor/Combiner/rollup thread
    pipeline (:80-95) maps onto: per-observer windows (the existing
    across-observers viewshed fan) are cut into tile-aligned uint32
    fragments; one groupBy(tile) sums fragments in numpy (the
    Combiner role); the global max is a scalar agg over per-tile
    maxima (no pixel leaves the tile); the rescale is a broadcast
    map.  Returns (tx, ty, px uint32, tile_max) tiles of the scaled
    output.
    """
    spark = tiles.sparkSession
    ts = tile_size
    if radius_px is None:
        radius_px = max(raster_w, raster_h)
    obs_rows = [(len(range(0, raster_h, spacing)) * i + j, x, y)
                for i, x in enumerate(range(0, raster_w, spacing))
                for j, y in enumerate(range(0, raster_h, spacing))]
    observers = spark.createDataFrame(obs_rows, "oid long, px long, py long")
    vs = viewshed_points(tiles, observers, ts, radius_px, dtype=dtype,
                         observer_z=observer_z, cell_mode=cell_mode,
                         raster_w=raster_w, raster_h=raster_h)

    frag_schema = ("tx long, ty long, fx int, fy int, fw int, fh int, "
                   "patch binary")

    def _frag(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                h, w = int(r["h"]), int(r["w"])
                x0, y0 = int(r["x0"]), int(r["y0"])
                ones = (np.frombuffer(r["vis"], dtype=np.uint8)
                        .reshape(h, w) != 0).astype(np.uint32)
                for ty in range(y0 // ts, (y0 + h - 1) // ts + 1):
                    for tx in range(x0 // ts, (x0 + w - 1) // ts + 1):
                        ax0 = max(x0, tx * ts)
                        ax1 = min(x0 + w - 1, tx * ts + ts - 1)
                        ay0 = max(y0, ty * ts)
                        ay1 = min(y0 + h - 1, ty * ts + ts - 1)
                        patch = ones[ay0 - y0:ay1 - y0 + 1,
                                     ax0 - x0:ax1 - x0 + 1]
                        rows.append({
                            "tx": tx, "ty": ty,
                            "fx": ax0 - tx * ts, "fy": ay0 - ty * ts,
                            "fw": ax1 - ax0 + 1, "fh": ay1 - ay0 + 1,
                            "patch": patch.tobytes()})
            yield pd.DataFrame(rows, columns=[
                "tx", "ty", "fx", "fy", "fw", "fh", "patch"])

    frags = vs.select("x0", "y0", "w", "h", "vis").mapInPandas(
        _frag, frag_schema)

    def _sum(key, pdf: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros((ts, ts), dtype=np.uint32)
        for _, r in pdf.iterrows():
            fh, fw = int(r["fh"]), int(r["fw"])
            p = np.frombuffer(r["patch"], dtype=np.uint32).reshape(fh, fw)
            canvas[int(r["fy"]):int(r["fy"]) + fh,
                   int(r["fx"]):int(r["fx"]) + fw] += p
        return pd.DataFrame([{
            "tx": int(key[0]), "ty": int(key[1]),
            "px": canvas.tobytes(), "tile_max": int(canvas.max())}])

    summed = frags.groupBy("tx", "ty").applyInPandas(_sum, CUM_SCHEMA)
    summed = summed.localCheckpoint(eager=True)  # reused: max + rescale
    m = summed.agg(F.max("tile_max")).collect()[0][0] or 0
    if m == 0:
        return summed
    factor = 255.0 / float(m)

    def _scale(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                a = np.frombuffer(r["px"], dtype=np.uint32)
                s = np.floor(factor * a).astype(np.uint32)
                out.append({"tx": int(r["tx"]), "ty": int(r["ty"]),
                            "px": s.tobytes(),
                            "tile_max": int(s.max())})
            yield pd.DataFrame(out, columns=["tx", "ty", "px", "tile_max"])

    return summed.mapInPandas(_scale, CUM_SCHEMA)

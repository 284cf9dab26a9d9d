"""Pansharpening: weighted-Brovey fusion of a high-res pan band with
upsampled multispectral bands.

Reference: GDALPansharpenOperation::WeightedBrovey3
(/root/reference/alg/gdalpansharpen.cpp:601-650) —
pseudo_pan = sum_i w_i * ms_up_i, factor = pan / pseudo_pan (0 when
pseudo_pan == 0, ComputeFactor :576-582), out_i = clamp(round(ms_up_i
* factor)).  Spectral bands are upsampled to the pan grid first in
the working dtype (GDALCreatePansharpenOptions defaults to cubic,
gdalpansharpen.cpp:58) — here that is a warp_tiles pass per band, so
every resampling kernel the warper supports works here too.

Scale shape: one warp job per spectral band (bands are few and the
jobs are independent), then a single (tx, ty) equi-join pan x bands
and one Arrow group per output tile — no shuffle beyond the join, no
driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels import checksum as kck
from ..kernels.cells import TileGrid
from .warp import warp_tiles

PS_SCHEMA = "band int, tx long, ty long, px binary, checksum long"


def pansharpen_tiles(pan_tiles: DataFrame, ms_tiles: DataFrame,
                     grid: TileGrid, ms_zoom: int, pan_zoom: int,
                     weights: list[float], bands: list[int],
                     method: str = "cubic", dtype: str = "uint8",
                     ms_tile_size: int | None = None,
                     pan_tile_size: int | None = None) -> DataFrame:
    """pan_tiles: (tx, ty, px) at pan_zoom; ms_tiles: (band, tx, ty,
    px) at ms_zoom.  Returns pansharpened (band, tx, ty, px, checksum)
    tiles at pan_zoom for every band in ``bands``."""
    if len(weights) != len(bands):
        raise ValueError("one weight per band")
    np_dtype = np.dtype(dtype)
    pts = pan_tile_size or grid.tile_size

    ups = None
    for b in bands:
        u = warp_tiles(
            ms_tiles.filter(F.col("band") == b).select("tx", "ty", "px"),
            grid, ms_zoom, grid, pan_zoom, direction="identity",
            dtype=dtype, src_tile_size=ms_tile_size,
            dst_tile_size=pts, method=method,
        ).select(F.lit(b).alias("band"), "tx", "ty",
                 F.col("px").alias("ms_px"))
        ups = u if ups is None else ups.unionByName(u)

    merged = pan_tiles.select(
        "tx", "ty", F.col("px").alias("pan_px")).join(
        ups, on=["tx", "ty"])

    w_by_band = dict(zip(bands, weights))
    n_bands = len(bands)

    def _brovey(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        pan = np.frombuffer(pdf["pan_px"].iloc[0],
                            dtype=np_dtype).astype(np.float64)
        ms = {int(r["band"]): np.frombuffer(r["ms_px"], dtype=np_dtype)
              .astype(np.float64) for _, r in pdf.iterrows()}
        if len(ms) != n_bands:        # a band tile missing: skip tile
            return pd.DataFrame(
                [], columns=["band", "tx", "ty", "px", "checksum"])
        pseudo = np.zeros_like(pan)
        for b in bands:               # accumulation order = band order
            pseudo += w_by_band[b] * ms[b]
        with np.errstate(invalid="ignore", divide="ignore"):
            factor = np.where(pseudo == 0.0, 0.0, pan / pseudo)
        out_rows = []
        info = np.iinfo(np_dtype) if not np.issubdtype(
            np_dtype, np.floating) else None
        for b in bands:
            v = ms[b] * factor
            if info is not None:
                v = np.clip(np.floor(v + 0.5), info.min, info.max)
            arr = v.astype(np_dtype).reshape(pts, pts)
            out_rows.append({
                "band": b, "tx": tx, "ty": ty, "px": arr.tobytes(),
                "checksum": kck.checksum(arr, is_float=info is None),
            })
        return pd.DataFrame(out_rows)

    return merged.groupBy("tx", "ty").applyInPandas(_brovey, PS_SCHEMA)

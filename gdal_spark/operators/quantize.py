"""Distributed color quantization: median-cut palette + RGB->PCT.

Scale shape mirrors the reference's own split of work
(alg/gdalmediancut.cpp builds a histogram then cuts it driver-side):

* histogram: per-tile numpy partials over the quantized 5-bit RGB
  cube, one groupBy-sum shuffle, and a bounded <= 32768-row collect —
  the cube size is constant in the data size, so the driver step is
  O(colors * levels) regardless of raster size;
* palette assignment / dither: broadcast the <= 256-entry palette and
  map tiles independently (one Arrow pass, no shuffle).  Error
  diffusion is carried strictly inside each tile: the reference's
  scan is globally serial (alg/gdaldither.cpp), so tile borders are
  the documented deviation — a single-tile raster is bit-exact.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels import checksum as kck
from ..kernels import quantize as kq

HIST_SCHEMA = "code long, cnt long"
PCT_SCHEMA = "tx long, ty long, px binary, checksum long"


def median_cut_palette(tiles: DataFrame, n_colors: int = 256,
                       n_bits: int = 5, tile_size: int = 256) -> np.ndarray:
    """tiles: (tx, ty, px_r, px_g, px_b) byte tiles.  Returns the
    (<= n_colors, 3) palette (driver-side cut over the distributed
    histogram, exactly the reference's split of labor)."""
    levels = 1 << n_bits
    shift = 8 - n_bits

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = np.zeros(levels ** 3, dtype=np.int64)
            for _, row in pdf.iterrows():
                if len(row["px_r"]) != tile_size * tile_size:
                    raise ValueError(
                        f"tile buffer is {len(row['px_r'])} bytes, "
                        f"expected {tile_size}^2")
                r = np.frombuffer(row["px_r"], dtype=np.uint8) >> shift
                g = np.frombuffer(row["px_g"], dtype=np.uint8) >> shift
                b = np.frombuffer(row["px_b"], dtype=np.uint8) >> shift
                code = ((r.astype(np.int64) * levels) + g) * levels + b
                acc += np.bincount(code, minlength=levels ** 3)
            nz = np.nonzero(acc)[0]
            yield pd.DataFrame({"code": nz, "cnt": acc[nz]})

    hist_rows = (tiles.select("px_r", "px_g", "px_b")
                 .mapInPandas(_partial, HIST_SCHEMA)
                 .groupBy("code").agg(F.sum("cnt").alias("cnt"))
                 .collect())                     # bounded: <= levels^3 rows
    hist = np.zeros((levels, levels, levels), dtype=np.int64)
    for row in hist_rows:
        c = int(row["code"])
        hist[c // (levels * levels), (c // levels) % levels, c % levels] = \
            int(row["cnt"])
    return kq.median_cut(hist, n_colors=n_colors, n_bits=n_bits)


def rgb_to_pct(tiles: DataFrame, palette: np.ndarray,
               tile_size: int = 256, dither: bool = True) -> DataFrame:
    """Map RGB tiles to palette indices — dithered (per-tile error
    diffusion) or plain nearest-color."""
    ts = tile_size
    pal = palette.copy()

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                r = np.frombuffer(row["px_r"], dtype=np.uint8).reshape(ts, ts)
                g = np.frombuffer(row["px_g"], dtype=np.uint8).reshape(ts, ts)
                b = np.frombuffer(row["px_b"], dtype=np.uint8).reshape(ts, ts)
                if dither:
                    idx = kq.dither(np.stack([r, g, b], axis=-1), pal)
                else:
                    idx = kq.find_nearest(pal, r, g, b)
                out.append({
                    "tx": int(row["tx"]), "ty": int(row["ty"]),
                    "px": idx.tobytes(),
                    "checksum": kck.checksum(idx),
                })
            yield pd.DataFrame(out)

    return tiles.select("tx", "ty", "px_r", "px_g", "px_b").mapInPandas(
        _map, PCT_SCHEMA)


def pct_to_rgb(tiles: DataFrame, palette: np.ndarray,
               tile_size: int = 256) -> DataFrame:
    """pct2rgb.py role: expand palette-index tiles back to RGB bands
    via the broadcast color table (pure lookup, tile-local)."""
    ts = tile_size
    pal = palette.copy()

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                idx = np.frombuffer(row["px"], dtype=np.uint8)
                for b in range(3):
                    arr = pal[idx, b].astype(np.uint8).reshape(ts, ts)
                    out.append({
                        "tx": int(row["tx"]), "ty": int(row["ty"]),
                        "band": b + 1, "px": arr.tobytes(),
                        "checksum": kck.checksum(arr),
                    })
            yield pd.DataFrame(out)

    return tiles.select("tx", "ty", "px").mapInPandas(
        _expand, "tx long, ty long, band int, px binary, checksum long")

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

Seam handling (``halo > 0``): the reference's diffusion propagates
strictly down and right — same-line carry to x+1, next-line error to
x-1/x/x+1 (gdaldither.cpp:516-527) — so no bottom halo is ever
needed, and each tile can be re-dithered inside a rectangle extended
by ``halo`` rows on top and ``halo`` columns left AND right (gathered
from the 5 neighbors L/R/T/TL/TR via one equi-join shuffle of sliced
strips, ~1.3x tile bytes), keeping only the center.

What this buys, honestly (measured in test_quantize.py::
test_dither_halo_seam_quality): error diffusion is CHAOTIC — a
single flipped index reshuffles all downstream noise — so per-pixel
index parity with the serial scan is not a meaningful target for any
distributed split (two equally good ditherings of a smooth gradient
differ on ~30% of pixels).  The metrics that matter and that the
halo pass verifiably improves are (a) the per-pixel index mismatch
fraction vs serial falls monotonically with halo, and (b) the
perceptual measures match the serial scan almost exactly: mean |rgb
- source| error within 0.05 intensity levels of the serial result
and mean output color drift < 0.4/255, both shrinking as the halo
grows.  halo=0 keeps the round-2 behavior (tile-local diffusion,
single-tile rasters bit-exact).
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
               tile_size: int = 256, dither: bool = True,
               halo: int = 0) -> DataFrame:
    """Map RGB tiles to palette indices — dithered (per-tile error
    diffusion) or plain nearest-color.  halo > 0 (dither only)
    exchanges halo strips with the L/R/T/TL/TR neighbors and
    re-diffuses across them so tile seams converge on the serial
    result (module docstring)."""
    ts = tile_size
    pal = palette.copy()
    if dither and halo > 0:
        return _rgb_to_pct_halo(tiles, pal, ts, int(halo))

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


def _rgb_to_pct_halo(tiles: DataFrame, pal: np.ndarray, ts: int,
                     halo: int) -> DataFrame:
    """Halo-overlap dither: ship each tile's border strips to the
    neighbors whose diffusion state they seed, assemble a
    (halo+ts) x (halo+ts+halo) rectangle per tile, run the serial
    kernel over it, keep the center."""
    K = halo
    if not 0 < K <= ts:
        raise ValueError("halo must be in (0, tile_size]")
    # (role, consumer offset, row slice, col slice, (h, w))
    _CUTS = [
        ("C", 0, 0, slice(None), slice(None), (ts, ts)),
        ("L", 1, 0, slice(None), slice(ts - K, None), (ts, K)),
        ("R", -1, 0, slice(None), slice(0, K), (ts, K)),
        ("T", 0, 1, slice(ts - K, None), slice(None), (K, ts)),
        ("TL", 1, 1, slice(ts - K, None), slice(ts - K, None), (K, K)),
        ("TR", -1, 1, slice(ts - K, None), slice(0, K), (K, K)),
    ]
    shapes = {r: hw for r, _dx, _dy, _rs, _cs, hw in _CUTS}

    def _fan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                bands = [np.frombuffer(row[c], dtype=np.uint8)
                         .reshape(ts, ts) for c in ("px_r", "px_g", "px_b")]
                for role, dx, dy, rs, cs, _hw in _CUTS:
                    out.append({
                        "ctx": int(row["tx"]) + dx,
                        "cty": int(row["ty"]) + dy,
                        "role": role,
                        "pr": bands[0][rs, cs].tobytes(),
                        "pg": bands[1][rs, cs].tobytes(),
                        "pb": bands[2][rs, cs].tobytes(),
                    })
            yield pd.DataFrame(out)

    fan = tiles.select("tx", "ty", "px_r", "px_g", "px_b").mapInPandas(
        _fan, "ctx long, cty long, role string, "
              "pr binary, pg binary, pb binary")

    def _run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        roles = {r["role"]: r for _, r in pdf.iterrows()}
        if "C" not in roles:              # halo strips for a tile that
            return pd.DataFrame(          # doesn't exist (image edge)
                columns=["tx", "ty", "px", "checksum"]).astype(
                {"tx": "int64", "ty": "int64", "checksum": "int64"})
        left_w = K if ("L" in roles or "TL" in roles) else 0
        top_h = K if ({"T", "TL", "TR"} & roles.keys()) else 0
        right_w = K if ("R" in roles or "TR" in roles) else 0
        rect = np.zeros((top_h + ts, left_w + ts + right_w, 3),
                        dtype=np.uint8)
        place = {
            "TL": (slice(0, top_h), slice(0, left_w)),
            "T": (slice(0, top_h), slice(left_w, left_w + ts)),
            "TR": (slice(0, top_h), slice(left_w + ts, None)),
            "L": (slice(top_h, None), slice(0, left_w)),
            "C": (slice(top_h, None), slice(left_w, left_w + ts)),
            "R": (slice(top_h, None), slice(left_w + ts, None)),
        }
        for role, r in roles.items():
            h, w = shapes[role]
            rs, cs = place[role]
            for ci, col in enumerate(("pr", "pg", "pb")):
                rect[rs, cs, ci] = np.frombuffer(
                    r[col], dtype=np.uint8).reshape(h, w)
        idx = kq.dither(rect, pal)[top_h:, left_w:left_w + ts]
        return pd.DataFrame({
            "tx": [int(key[0])], "ty": [int(key[1])],
            "px": [idx.tobytes()], "checksum": [kck.checksum(idx)],
        })

    return fan.groupBy("ctx", "cty").applyInPandas(_run, PCT_SCHEMA)


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

"""Distributed focal (neighborhood) operators via halo exchange.

gdaldem's 3x3 window ops need each pixel's 8 neighbors; at tile
boundaries those live in OTHER tiles (on other executors at scale).
``Window.partitionBy`` can't express a 2-D halo, so the operator does
an explicit halo exchange — the distributed form of gdaldem's
three-line rolling window (/root/reference/apps/gdaldem_lib.cpp:466+):

  1. per tile (mapInPandas): emit the center payload to itself AND
     1-px border strips/corners addressed to each of the 8 neighbor
     tiles — the shuffle carries ~4*ts pixels per tile, not 9 full
     copies;
  2. groupBy destination tile (applyInPandas): assemble the padded
     (ts+2)^2 array — NaN where a neighbor doesn't exist (global
     raster edge, matching gdaldem's edge nodata) — and run the
     numpy kernel (kernels.focal);
  3. emit the result tile (float32) with its golden checksum.

Tile-split invariance: away from the global edge, the assembled halo
equals the single-array window, so the distributed result ==
kernels.focal.focal_array — asserted in tests at every kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import checksum as kck
from ..kernels import focal as kf

HALO_SCHEMA = "dtx long, dty long, band int, part string, payload binary"
OUT_SCHEMA = "z int, tx bigint, ty bigint, band int, px binary, checksum long"

# part -> (slice of source tile, placement in padded dest)
_PARTS = {
    "c":  (np.s_[:, :],   np.s_[1:-1, 1:-1]),
    "n":  (np.s_[-1:, :], np.s_[0:1, 1:-1]),    # my bottom row = their north halo
    "s":  (np.s_[0:1, :], np.s_[-1:, 1:-1]),
    "w":  (np.s_[:, -1:], np.s_[1:-1, 0:1]),
    "e":  (np.s_[:, 0:1], np.s_[1:-1, -1:]),
    "nw": (np.s_[-1:, -1:], np.s_[0:1, 0:1]),
    "ne": (np.s_[-1:, 0:1], np.s_[0:1, -1:]),
    "sw": (np.s_[0:1, -1:], np.s_[-1:, 0:1]),
    "se": (np.s_[0:1, 0:1], np.s_[-1:, -1:]),
}
_OFFSETS = {
    "c": (0, 0), "n": (0, 1), "s": (0, -1), "w": (1, 0), "e": (-1, 0),
    "nw": (1, 1), "ne": (-1, 1), "sw": (1, -1), "se": (-1, -1),
}


def focal_tiles(tiles: DataFrame, kernel: str, zoom: int,
                ewres: float = 1.0, nsres: float = 1.0,
                dtype: str = "uint8", tile_size: int = 256,
                out_dtype: str = "float32") -> DataFrame:
    np_dtype = np.dtype(dtype)
    np_out = np.dtype(out_dtype)
    ts = tile_size

    from pyspark.sql import functions as F
    src_df = tiles if "band" in tiles.columns else tiles.withColumn(
        "band", F.lit(1))

    def _emit_halo(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["px"], dtype=np_dtype).reshape(ts, ts)
                for part, (src, _dst) in _PARTS.items():
                    dx, dy = _OFFSETS[part]
                    rows.append((
                        int(r["tx"]) + dx, int(r["ty"]) + dy,
                        int(r["band"]), part, arr[src].tobytes(),
                    ))
            yield pd.DataFrame(
                rows, columns=["dtx", "dty", "band", "part", "payload"])

    halo = src_df.select("tx", "ty", "band", "px").mapInPandas(
        _emit_halo, HALO_SCHEMA)

    def _apply(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty, band = int(key[0]), int(key[1]), int(key[2])
        parts = dict(zip(pdf["part"], pdf["payload"]))
        if "c" not in parts:        # pure-neighbor group: no center tile
            return pd.DataFrame(
                [], columns=["z", "tx", "ty", "band", "px", "checksum"])
        padded = np.full((ts + 2, ts + 2), np.nan, dtype=np.float64)
        for part, raw in parts.items():
            src, dst = _PARTS[part]
            shape = padded[dst].shape
            padded[dst] = np.frombuffer(raw, dtype=np_dtype).reshape(shape)
        out = kf.KERNELS[kernel](padded, ewres, nsres).astype(np_out)
        return pd.DataFrame({
            "z": [zoom], "tx": [tx], "ty": [ty], "band": [band],
            "px": [out.tobytes()],
            "checksum": [kck.checksum(out.astype(np.float64), is_float=True)],
        })

    # band in the key: multi-band inputs filter per band
    return halo.groupBy("dtx", "dty", "band").applyInPandas(
        _apply, OUT_SCHEMA)

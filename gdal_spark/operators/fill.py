"""Fill nodata: interpolate missing pixels from nearby valid ones.

Semantics target: GDALFillNodata
(/root/reference/alg/rasterfill.cpp:394) — inverse-distance
interpolation from surrounding valid pixels within a search radius.
This implementation IDW-weights (1/d^2) ALL valid pixels within
Chebyshev radius ``radius`` (the reference scans four directional
rays then smooths; same intent, simpler determinism) — pixels with no
valid neighbor in range stay nodata.

Distributed shape: a generalized k-pixel halo exchange (the focal
operators' 1-px strips, widened to ``radius``), then per-tile
vectorized numpy.  Tile-split invariance vs the single-array kernel
is the correctness contract, as with every raster operator here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import checksum as kck

OUT_SCHEMA = "tx long, ty long, px binary, checksum long"


def fill_nodata_array(arr, nodata, radius: int):
    """Single-array kernel: IDW(1/d^2) over valid pixels within the
    Chebyshev radius; NaN-padded edges contribute nothing."""
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    pad = np.full((h + 2 * radius, w + 2 * radius), np.nan)
    pad[radius:-radius, radius:-radius] = np.where(a == nodata, np.nan, a)
    out = a.copy()
    ys, xs = np.nonzero(a == nodata)
    for y, x in zip(ys.tolist(), xs.tolist()):
        win = pad[y:y + 2 * radius + 1, x:x + 2 * radius + 1]
        vy, vx = np.nonzero(~np.isnan(win))
        if len(vy) == 0:
            continue
        d2 = (vy - radius) ** 2.0 + (vx - radius) ** 2.0
        wgt = 1.0 / d2
        out[y, x] = float((win[vy, vx] * wgt).sum() / wgt.sum())
    return out


def fill_nodata_tiles(tiles: DataFrame, nodata, radius: int = 3,
                      dtype: str = "float32",
                      tile_size: int = 256) -> DataFrame:
    np_dtype = np.dtype(dtype)
    ts = tile_size
    H = radius

    def _emit(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["px"], dtype=np_dtype).reshape(ts, ts)
                tx, ty = int(r["tx"]), int(r["ty"])
                # center + 8 neighbors get H-wide strips
                for dx, dy, sl in (
                    (0, 0, np.s_[:, :]),
                    (1, 0, np.s_[:, -H:]), (-1, 0, np.s_[:, :H]),
                    (0, 1, np.s_[-H:, :]), (0, -1, np.s_[:H, :]),
                    (1, 1, np.s_[-H:, -H:]), (-1, 1, np.s_[-H:, :H]),
                    (1, -1, np.s_[:H, -H:]), (-1, -1, np.s_[:H, :H]),
                ):
                    rows.append((tx + dx, ty + dy, f"{dx}:{dy}",
                                 arr[sl].tobytes()))
            yield pd.DataFrame(rows, columns=["dtx", "dty", "part", "payload"])

    halo = tiles.select("tx", "ty", "px").mapInPandas(
        _emit, "dtx long, dty long, part string, payload binary")

    _PLACE = {
        "0:0": np.s_[1, 1], "1:0": np.s_[1, 0], "-1:0": np.s_[1, 2],
        "0:1": np.s_[0, 1], "0:-1": np.s_[2, 1],
        "1:1": np.s_[0, 0], "-1:1": np.s_[0, 2],
        "1:-1": np.s_[2, 0], "-1:-1": np.s_[2, 2],
    }

    def _fill(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = dict(zip(pdf["part"], pdf["payload"]))
        if "0:0" not in parts:
            return pd.DataFrame(
                [], columns=["tx", "ty", "px", "checksum"])
        tx, ty = int(key[0]), int(key[1])
        P = np.full((ts + 2 * H, ts + 2 * H), np.nan)
        for part, raw in parts.items():
            qy, qx = _PLACE[part]
            hgt = ts if qy == 1 else H
            wid = ts if qx == 1 else H
            y0 = 0 if qy == 0 else (H if qy == 1 else H + ts)
            x0 = 0 if qx == 0 else (H if qx == 1 else H + ts)
            P[y0:y0 + hgt, x0:x0 + wid] = np.frombuffer(
                raw, dtype=np_dtype).reshape(hgt, wid)
        valid = np.where(P == nodata, np.nan, P)
        center = P[H:H + ts, H:H + ts].copy()
        ys, xs = np.nonzero(center == nodata)
        for y, x in zip(ys.tolist(), xs.tolist()):
            win = valid[y:y + 2 * H + 1, x:x + 2 * H + 1]
            vy, vx = np.nonzero(~np.isnan(win))
            if len(vy) == 0:
                continue
            d2 = (vy - H) ** 2.0 + (vx - H) ** 2.0
            wgt = 1.0 / d2
            center[y, x] = float((win[vy, vx] * wgt).sum() / wgt.sum())
        out = center.astype(np_dtype)
        return pd.DataFrame({
            "tx": [tx], "ty": [ty], "px": [out.tobytes()],
            "checksum": [kck.checksum(out.astype(np.float64),
                                      is_float=True)],
        })

    return halo.groupBy("dtx", "dty").applyInPandas(_fill, OUT_SCHEMA)

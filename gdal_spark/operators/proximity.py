"""Distributed proximity: distance raster to nearest target pixel.

The reference scans the whole raster twice
(/root/reference/alg/gdalproximity.cpp:94); a 10^12-pixel raster
distributes instead as a bounded-radius gather:

  1. per tile, extract target-pixel coordinates (sparse);
  2. ship each tile's targets to every tile within Chebyshev radius
     R = ceil(maxdist / tile_size) — the only data motion, sparse
     coordinates keyed by destination tile;
  3. per destination tile, exact Euclidean distance to the gathered
     targets (vectorized kernel), FILL beyond maxdist.

Correct because a target farther than R tiles away is farther than
maxdist by construction — the same bounding GDAL applies with its
maxdist option.  Tile-split invariance vs kernels.proximity asserted
in tests.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels import checksum as kck
from ..kernels import proximity as kprox

OUT_SCHEMA = "tx long, ty long, px binary, checksum long"


def proximity_tiles(tiles: DataFrame, target_values, maxdist: float,
                    dtype: str = "uint8", tile_size: int = 256,
                    out_dtype: str = "float32") -> DataFrame:
    np_dtype = np.dtype(dtype)
    np_out = np.dtype(out_dtype)
    ts = tile_size
    R = int(math.ceil(maxdist / ts))
    tvals = sorted(set(int(v) for v in target_values))

    def _targets(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["px"], dtype=np_dtype).reshape(ts, ts)
                tys, txs = kprox.target_pixels(arr, tvals)
                gys = (tys + int(r["ty"]) * ts).tobytes()
                gxs = (txs + int(r["tx"]) * ts).tobytes()
                # one row per (source tile -> dest tile) in the R-disk
                for dy in range(-R, R + 1):
                    for dx in range(-R, R + 1):
                        rows.append((int(r["tx"]) + dx, int(r["ty"]) + dy,
                                     gys, gxs))
            yield pd.DataFrame(rows, columns=["dtx", "dty", "gys", "gxs"])

    gathered = tiles.select("tx", "ty", "px").mapInPandas(
        _targets, "dtx long, dty long, gys binary, gxs binary")

    # destination tiles = existing tiles (left-join semantics: only
    # materialized tiles produce output)
    dests = tiles.select(
        F.col("tx").alias("dtx"), F.col("ty").alias("dty"))

    def _compute(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        tys = (np.concatenate([np.frombuffer(b, dtype=np.int64)
                               for b in pdf["gys"]])
               if len(pdf) else np.zeros(0, dtype=np.int64))
        txs = (np.concatenate([np.frombuffer(b, dtype=np.int64)
                               for b in pdf["gxs"]])
               if len(pdf) else np.zeros(0, dtype=np.int64))
        out = kprox.proximity_from_targets(
            (ts, ts), tys, txs, maxdist, y0=ty * ts, x0=tx * ts)
        out_t = out.astype(np_out)
        return pd.DataFrame({
            "tx": [tx], "ty": [ty], "px": [out_t.tobytes()],
            "checksum": [kck.checksum(out_t.astype(np.float64),
                                      is_float=True)],
        })

    return (
        gathered.join(dests, ["dtx", "dty"], "inner")
        .groupBy("dtx", "dty")
        .applyInPandas(_compute, OUT_SCHEMA)
    )

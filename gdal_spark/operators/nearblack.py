"""Distributed nearblack (apps/nearblack_lib.cpp:360-745).

Decomposition: the vertical per-column count recurrence saturates at
``max_non_black + 1`` — a ``max+2``-state machine per column — so the
top-down and bottom-up scans are parallel-prefix scans over
full-width row strips:

  stage A  per strip: per-column state-transition tables for both
           scan directions (kernels/nearblack.py::strip_transitions),
           one tiny (max+2, W) uint8 array per strip.
  fold     compose tables in strip order to get each strip's incoming
           state vector.  O(#strips × W) driver work on uint8 lookups
           (the bounded-driver-step pattern used by mediancut); a
           two-level segmented scan is the drop-in upgrade if #strips
           × W outgrows the driver.
  stage B  per strip, independently: replay the exact ProcessLine
           decisions (vertical + both horizontal sweeps, both passes)
           from the incoming states and emit output tiles + mask.

Exactness: blackening writes the exact target color, which is within
``near_dist`` of itself, so the non-near classification is invariant
across passes and sweeps — stage B over the original pixels replays
precisely what the serial two-pass algorithm computes
(tests/test_nearblack.py asserts bit-equality vs the serial kernel,
including max_non_black > 0 and the white variant).

Scale: strips are full raster width (the horizontal sweep is a
per-line sequential dependence) — at W=10^6, tile_size=256 a strip is
256 MB, one task; strip count drives parallelism.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels.nearblack import (
    compose_states, strip_blacken, strip_transitions)

OUT_SCHEMA = "tx long, ty long, px binary, mask binary"


def _strip(pdf: pd.DataFrame, tile_size: int, ntx: int,
           dtype: str) -> np.ndarray:
    """Assemble one full-width strip (tile row) from its tiles."""
    np_dtype = np.dtype(dtype)
    arr = np.zeros((tile_size, ntx * tile_size), dtype=np_dtype)
    for _, r in pdf.iterrows():
        t = np.frombuffer(r["px"], dtype=np_dtype).reshape(
            tile_size, tile_size)
        x0 = int(r["tx"]) * tile_size
        arr[:, x0:x0 + tile_size] = t
    return arr


def nearblack_tiles(tiles: DataFrame, ntx: int, nty: int,
                    tile_size: int = 256, near_dist: int = 15,
                    max_non_black: int = 2, white: bool = False,
                    dtype: str = "uint8") -> DataFrame:
    """nearblack over (tx, ty, px) tiles -> (tx, ty, px, mask).

    Single-band tiles; the target color is all-black (or all-white
    with ``white``), i.e. the tool's default -near path without a
    -color list.
    """
    spark = tiles.sparkSession
    w = ntx * tile_size
    h = nty * tile_size
    nd, mnb, wh = int(near_dist), int(max_non_black), bool(white)

    # ---- stage A: per-strip transition tables ----
    def _trans(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty = int(key[0])
        arr = _strip(pdf, tile_size, ntx, dtype)
        nn = _nonnear(arr, nd, wh)
        t_down = strip_transitions(nn, mnb, False, ty == 0)
        t_up = strip_transitions(nn, mnb, True, ty == nty - 1)
        return pd.DataFrame([{"ty": ty, "down": t_down.tobytes(),
                              "up": t_up.tobytes()}])

    trans = (tiles.groupBy("ty")
             .applyInPandas(_trans, "ty long, down binary, up binary")
             .orderBy("ty").collect())
    n_states = mnb + 2
    tdown = {r["ty"]: np.frombuffer(r["down"], dtype=np.uint8)
             .reshape(n_states, w) for r in trans}
    tup = {r["ty"]: np.frombuffer(r["up"], dtype=np.uint8)
           .reshape(n_states, w) for r in trans}

    # ---- driver fold: incoming state per strip, both directions ----
    in_down, in_up = {}, {}
    s = np.zeros(w, dtype=np.uint8)
    for ty in range(nty):
        in_down[ty] = s
        s = compose_states(s, tdown[ty])
    s = np.zeros(w, dtype=np.uint8)
    for ty in range(nty - 1, -1, -1):
        in_up[ty] = s
        s = compose_states(s, tup[ty])
    bc = spark.sparkContext.broadcast(
        {ty: (in_down[ty].tobytes(), in_up[ty].tobytes())
         for ty in range(nty)})

    # ---- stage B: replay decisions per strip, emit tiles ----
    def _apply(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty = int(key[0])
        arr = _strip(pdf, tile_size, ntx, dtype)
        nn = _nonnear(arr, nd, wh)
        d0, u0 = bc.value[ty]
        down0 = np.frombuffer(d0, dtype=np.uint8)
        up0 = np.frombuffer(u0, dtype=np.uint8)
        black = strip_blacken(nn, down0, mnb, False, ty * tile_size)
        black |= strip_blacken(nn, up0, mnb, True,
                               h - 1 - (ty * tile_size + tile_size - 1))
        out = arr.copy()
        out[black] = 255 if wh else 0
        mask = np.where(black, 0, 255).astype(np.uint8)
        rows = []
        for tx in range(ntx):
            x0 = tx * tile_size
            rows.append({"tx": tx, "ty": ty,
                         "px": out[:, x0:x0 + tile_size].tobytes(),
                         "mask": mask[:, x0:x0 + tile_size].tobytes()})
        return pd.DataFrame(rows)

    return tiles.groupBy("ty").applyInPandas(_apply, OUT_SCHEMA)


def _nonnear(arr: np.ndarray, near_dist: int, white: bool) -> np.ndarray:
    from ..kernels.nearblack import _nonnear_matrix
    return _nonnear_matrix(arr, near_dist, white)

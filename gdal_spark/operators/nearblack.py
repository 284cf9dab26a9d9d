"""Distributed nearblack (apps/nearblack_lib.cpp:360-745).

Decomposition: the vertical per-column count recurrence saturates at
``max_non_black + 1`` — a ``max+2``-state machine per column — so the
top-down and bottom-up scans are parallel-prefix scans over
full-width row strips:

  stage A  per strip: per-column state-transition tables for both
           scan directions (kernels/nearblack.py::strip_transitions),
           one tiny (max+2, W) uint8 array per strip.
  scan     TWO-LEVEL SEGMENTED SCAN (tables compose associatively,
           kernels/nearblack.py::compose_tables): strips are grouped
           into chunks of ``chunk`` strips; each chunk composes its
           tables executor-side into ONE chunk-total table; only the
           #strips/chunk chunk totals reach the driver, which folds
           them into per-chunk incoming STATE VECTORS (w bytes each)
           and broadcasts those.  A second executor pass replays each
           chunk from its incoming state to emit per-STRIP incoming
           states.  Driver memory drops from O(#strips × W) to
           O(#strips/chunk × W) — another level of the same scan
           bounds it by W × log if ever needed.
  stage B  per strip, independently (tiles COGROUPed with the strip's
           incoming-state row, so the W-byte vectors are never
           duplicated per tile): replay the exact ProcessLine
           decisions (vertical + both horizontal sweeps, both passes)
           and emit output tiles + mask.

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
    compose_states, compose_tables, strip_blacken, strip_transitions)

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
                    dtype: str = "uint8", chunk: int = 64) -> DataFrame:
    """nearblack over (tx, ty, px) tiles -> (tx, ty, px, mask).

    Single-band tiles; the target color is all-black (or all-white
    with ``white``), i.e. the tool's default -near path without a
    -color list.  ``chunk`` is the segmented-scan group size: the
    driver holds only ceil(nty/chunk) chunk-total tables at a time
    (O(#strips/chunk x W) instead of O(#strips x W)).
    """
    spark = tiles.sparkSession
    w = ntx * tile_size
    h = nty * tile_size
    nd, mnb, wh = int(near_dist), int(max_non_black), bool(white)
    n_states = mnb + 2
    chunk = max(1, int(chunk))
    n_chunks = (nty + chunk - 1) // chunk

    # ---- stage A: per-strip transition tables (stays distributed) ----
    def _trans(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty = int(key[0])
        arr = _strip(pdf, tile_size, ntx, dtype)
        nn = _nonnear(arr, nd, wh)
        t_down = strip_transitions(nn, mnb, False, ty == 0)
        t_up = strip_transitions(nn, mnb, True, ty == nty - 1)
        return pd.DataFrame([{"ty": ty, "chunk": ty // chunk,
                              "down": t_down.tobytes(),
                              "up": t_up.tobytes()}])

    trans = (tiles.groupBy("ty")
             .applyInPandas(_trans,
                            "ty long, chunk long, down binary, up binary")
             .persist())

    # ---- level 1: chunk-total tables, composed executor-side ----
    def _chunk_total(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ty")
        tabs_d = [np.frombuffer(b, dtype=np.uint8).reshape(n_states, w)
                  for b in pdf["down"]]
        tabs_u = [np.frombuffer(b, dtype=np.uint8).reshape(n_states, w)
                  for b in pdf["up"]]
        td = tabs_d[0]
        for nxt in tabs_d[1:]:
            td = compose_tables(td, nxt)          # down: increasing ty
        tu = tabs_u[-1]
        for nxt in tabs_u[-2::-1]:
            tu = compose_tables(tu, nxt)          # up: decreasing ty
        return pd.DataFrame([{"chunk": int(key[0]),
                              "down": td.tobytes(), "up": tu.tobytes()}])

    totals = (trans.groupBy("chunk")
              .applyInPandas(_chunk_total,
                             "chunk long, down binary, up binary")
              .collect())
    ch_d = {r["chunk"]: np.frombuffer(r["down"], dtype=np.uint8)
            .reshape(n_states, w) for r in totals}
    ch_u = {r["chunk"]: np.frombuffer(r["up"], dtype=np.uint8)
            .reshape(n_states, w) for r in totals}

    # ---- driver fold over CHUNK totals only: per-chunk incoming ----
    in_d, in_u = {}, {}
    s = np.zeros(w, dtype=np.uint8)
    for c in range(n_chunks):
        in_d[c] = s
        s = compose_states(s, ch_d[c])
    s = np.zeros(w, dtype=np.uint8)
    for c in range(n_chunks - 1, -1, -1):
        in_u[c] = s
        s = compose_states(s, ch_u[c])
    bc = spark.sparkContext.broadcast(
        {c: (in_d[c].tobytes(), in_u[c].tobytes())
         for c in range(n_chunks)})

    # ---- level 2: replay within chunk -> per-STRIP incoming states ----
    def _strip_states(key, pdf: pd.DataFrame) -> pd.DataFrame:
        c = int(key[0])
        pdf = pdf.sort_values("ty")
        d0, u0 = bc.value[c]
        rows = {}
        s = np.frombuffer(d0, dtype=np.uint8)
        for ty, b in zip(pdf["ty"], pdf["down"]):
            rows[int(ty)] = [s.tobytes(), None]
            s = compose_states(
                s, np.frombuffer(b, dtype=np.uint8).reshape(n_states, w))
        s = np.frombuffer(u0, dtype=np.uint8)
        for ty, b in zip(pdf["ty"][::-1], pdf["up"][::-1]):
            rows[int(ty)][1] = s.tobytes()
            s = compose_states(
                s, np.frombuffer(b, dtype=np.uint8).reshape(n_states, w))
        return pd.DataFrame(
            [{"ty": ty, "down_state": d, "up_state": u}
             for ty, (d, u) in rows.items()])

    strip_states = trans.groupBy("chunk").applyInPandas(
        _strip_states, "ty long, down_state binary, up_state binary")

    # ---- stage B: replay decisions per strip (cogrouped with its
    # incoming-state row so the W-byte vectors are never duplicated
    # per tile), emit tiles ----
    def _apply(key, pdf: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
        ty = int(key[0])
        arr = _strip(pdf, tile_size, ntx, dtype)
        nn = _nonnear(arr, nd, wh)
        down0 = np.frombuffer(st["down_state"].iloc[0], dtype=np.uint8)
        up0 = np.frombuffer(st["up_state"].iloc[0], dtype=np.uint8)
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

    return (tiles.groupby("ty")
            .cogroup(strip_states.groupby("ty"))
            .applyInPandas(_apply, OUT_SCHEMA))


def _nonnear(arr: np.ndarray, near_dist: int, white: bool) -> np.ndarray:
    from ..kernels.nearblack import _nonnear_matrix
    return _nonnear_matrix(arr, near_dist, white)

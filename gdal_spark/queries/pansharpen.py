"""Pansharpen catalog query: the full fused pipeline (per-band
bilinear upsample to the pan grid, byte-rounded working buffer, then
weighted Brovey) mirrored as one independent DuckDB CTE chain.

Interior-only projection (r, c in 1..62) so every bilinear window is
fully inside the spectral grid — edge renormalization is covered by
tests/test_warp.py instead.  All fractional phases and weights are
dyadic, so both engines compute bit-identical doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from . import register
from .raster import GW

_MS_W = GW // 2          # spectral grid side (2x coarser than pan)
_BANDS = [0, 1, 2]
_BMUL = {0: 7, 1: 3, 2: 5}
_WEIGHTS = [0.25, 0.375, 0.375]

_PS_SQL = f"""
    WITH msg AS (
      SELECT b.i AS band, r.i AS r, c.i AS c,
             CAST(((r.i * {_MS_W} + c.i) *
                   (CASE b.i WHEN 0 THEN 7 WHEN 1 THEN 3 ELSE 5 END))
                  % 256 AS DOUBLE) AS v
      FROM generate_series(0, 2) b(i),
           generate_series(0, {_MS_W - 1}) r(i),
           generate_series(0, {_MS_W - 1}) c(i)
    ),
    q AS (
      SELECT r.i AS r, c.i AS c,
             0.5 * c.i - 0.25 AS fx, 0.5 * r.i - 0.25 AS fy
      FROM generate_series(1, {GW - 2}) r(i),
           generate_series(1, {GW - 2}) c(i)
    ),
    w AS (
      SELECT r, c,
             CAST(FLOOR(fx) AS BIGINT) AS x0, fx - FLOOR(fx) AS dx,
             CAST(FLOOR(fy) AS BIGINT) AS y0, fy - FLOOR(fy) AS dy
      FROM q
    ),
    up AS (
      -- one range join + single-element pivot SUMs (the 4-way
      -- self-join shape sends the join-order planner into the weeds;
      -- term order matches the numpy kernel's accumulation exactly)
      SELECT w.r, w.c, g.band,
             CAST(FLOOR(
               SUM(CASE WHEN g.r = w.y0 AND g.c = w.x0
                        THEN (1-w.dx)*(1-w.dy)*g.v END)
             + SUM(CASE WHEN g.r = w.y0 AND g.c = w.x0 + 1
                        THEN w.dx*(1-w.dy)*g.v END)
             + SUM(CASE WHEN g.r = w.y0 + 1 AND g.c = w.x0
                        THEN (1-w.dx)*w.dy*g.v END)
             + SUM(CASE WHEN g.r = w.y0 + 1 AND g.c = w.x0 + 1
                        THEN w.dx*w.dy*g.v END)
             + 0.5) AS DOUBLE) AS uv
      FROM w JOIN msg g
        ON g.r >= w.y0 AND g.r <= w.y0 + 1
       AND g.c >= w.x0 AND g.c <= w.x0 + 1
      GROUP BY w.r, w.c, g.band
    ),
    pan AS (
      SELECT r.i AS r, c.i AS c,
             CAST(((r.i * {GW} + c.i) * 11) % 256 AS DOUBLE) AS p
      FROM generate_series(0, {GW - 1}) r(i), generate_series(0, {GW - 1}) c(i)
    ),
    piv AS (
      SELECT r, c,
             MAX(CASE WHEN band = 0 THEN uv END) AS u0,
             MAX(CASE WHEN band = 1 THEN uv END) AS u1,
             MAX(CASE WHEN band = 2 THEN uv END) AS u2
      FROM up GROUP BY r, c
    ),
    f AS (
      SELECT piv.r, piv.c, u0, u1, u2, pan.p,
             0.25 * u0 + 0.375 * u1 + 0.375 * u2 AS pseudo
      FROM piv JOIN pan ON pan.r = piv.r AND pan.c = piv.c
    )
    SELECT b.i AS band, f.r, f.c,
           LEAST(GREATEST(CAST(FLOOR(
             (CASE b.i WHEN 0 THEN u0 WHEN 1 THEN u1 ELSE u2 END)
             * (CASE WHEN pseudo = 0 THEN 0.0 ELSE p / pseudo END)
             + 0.5) AS BIGINT), 0), 255) AS value
    FROM f, generate_series(0, 2) b(i)
    ORDER BY band, f.r, f.c
"""


def _grid_tiles(spark, side, mul, tile_px, tag_bands=None):
    """(band?, tx, ty, px) tiles of the derived grid
    v = (idx * mul) % 256 split into (side/tile_px)^2 tiles."""
    n = side // tile_px

    def _mk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b in (tag_bands or [None]):
            m = mul if b is None else _BMUL[b]
            a = ((np.arange(side * side).reshape(side, side) * m) % 256
                 ).astype(np.uint8)
            for ty in range(n):
                for tx in range(n):
                    row = {"tx": tx, "ty": ty,
                           "px": a[ty * tile_px:(ty + 1) * tile_px,
                                   tx * tile_px:(tx + 1) * tile_px].tobytes()}
                    if b is not None:
                        row["band"] = b
                    rows.append(row)
        return pd.DataFrame(rows)

    schema = ("band int, tx long, ty long, px binary" if tag_bands
              else "tx long, ty long, px binary")
    return spark.range(1).withColumn("_g", F.lit(1)).groupBy(
        "_g").applyInPandas(_mk, schema)


@register(
    "pansharpen",
    sql=_PS_SQL,
    desc="weighted-Brovey pansharpen (GDALPansharpenOperation::"
         "WeightedBrovey3, gdalpansharpen.cpp:601-650): per-band warp "
         "upsample to the pan grid (byte working buffer), pseudo-pan "
         "weighted sum, factor = pan/pseudo, rounded+clamped output; "
         "full pipeline mirrored in SQL",
)
def pansharpen_q(spark, sf_dir):
    from ..kernels.cells import TileGrid
    from ..operators.pansharpen import pansharpen_tiles

    grid = TileGrid(0.0, float(GW), float(GW), GW // 2)
    pan = _grid_tiles(spark, GW, 11, GW // 2)
    ms = _grid_tiles(spark, _MS_W, None, _MS_W, tag_bands=_BANDS)
    out = pansharpen_tiles(pan, ms, grid, ms_zoom=0, pan_zoom=1,
                           weights=_WEIGHTS, bands=_BANDS,
                           method="bilinear", ms_tile_size=_MS_W,
                           pan_tile_size=GW // 2)

    ts = GW // 2

    def _rows(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                t = np.frombuffer(rr["px"], dtype=np.uint8).reshape(ts, ts)
                ys, xs = np.mgrid[0:ts, 0:ts]
                gr = (int(rr["ty"]) * ts + ys).ravel()
                gc = (int(rr["tx"]) * ts + xs).ravel()
                m = ((gr >= 1) & (gr <= GW - 2)
                     & (gc >= 1) & (gc <= GW - 2))
                yield pd.DataFrame({
                    "band": np.full(int(m.sum()), int(rr["band"]),
                                    dtype=np.int64),
                    "r": gr[m], "c": gc[m],
                    "value": t.ravel()[m].astype(np.int64),
                })

    return out.mapInPandas(
        _rows, "band long, r long, c long, value long"
    ).orderBy("band", "r", "c")

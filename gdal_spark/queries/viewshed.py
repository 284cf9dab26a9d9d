"""Viewshed + line-of-sight catalog queries.

``los`` carries a fully independent SQL oracle: the Bresenham2D
traversal of /root/reference/alg/los.cpp:37-108 re-derived as a
DuckDB RECURSIVE CTE (one walker per pair advancing a step per
iteration), with GDAL's interpolated test height
lerp(za, zb, sqrt(r2/R2)) (:330-346) and the strictly-above terrain
test (:120-133) — both FP-order-matched to the numpy kernel.

``viewshed`` is the reference-plane sweep (inherently sequential
recurrence — not SQL-expressible); its oracle is the serial-golden
VALUES pattern: the pytest-covered kernel run serially over the full
derived grid, compressed to per-(observer, row) visible counts and
column sums, which checks the distributed gather/assembly end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from . import register
from .raster import GW, _pixel_tiles_df

_N_PAIRS = 20
_OBSERVERS = [(1, 16, 20), (2, 40, 44), (3, 60, 8)]
_OBS_Z = 30.0


def _pair_params(k: int):
    xa, ya = (k * 7 + 3) % GW, (k * 11 + 5) % GW
    xb, yb = (k * 29 + 1) % GW, (k * 17 + 2) % GW

    def v(r, c):
        return float(((r * GW + c) * 7) % 256)

    za_off = -0.5 if k % 7 == 5 else 1.5 + k * 0.125
    za = v(ya, xa) + za_off
    zb = v(yb, xb) + 2.25 + k * 0.0625
    return xa, ya, za, xb, yb, zb


@register(
    "los",
    sql=f"""
    WITH RECURSIVE
    gpx AS (
      SELECT r.i AS r, c.i AS c,
             CAST(((r.i * {GW} + c.i) * 7) % 256 AS DOUBLE) AS v
      FROM generate_series(0, {GW - 1}) r(i), generate_series(0, {GW - 1}) c(i)
    ),
    pairs AS (
      SELECT k.i AS pid,
             (k.i * 7 + 3) % {GW} AS xa, (k.i * 11 + 5) % {GW} AS ya,
             (k.i * 29 + 1) % {GW} AS xb, (k.i * 17 + 2) % {GW} AS yb
      FROM generate_series(0, {_N_PAIRS - 1}) k(i)
    ),
    pz AS (
      SELECT p.*,
             ga.v + CASE WHEN p.pid % 7 = 5 THEN -0.5
                         ELSE 1.5 + p.pid * 0.125 END AS za,
             gb.v + 2.25 + p.pid * 0.0625 AS zb,
             ga.v AS va, gb.v AS vb,
             ABS(p.xb - p.xa) AS dx, ABS(p.yb - p.ya) AS dy,
             CASE WHEN p.xb >= p.xa THEN 1 ELSE -1 END AS incx,
             CASE WHEN p.yb >= p.ya THEN 1 ELSE -1 END AS incy
      FROM pairs p
      JOIN gpx ga ON ga.r = p.ya AND ga.c = p.xa
      JOIN gpx gb ON gb.r = p.yb AND gb.c = p.xb
    ),
    walk AS (
      SELECT pid, dx, dy, incx, incy, xa, ya, xb, yb, za, zb,
             xa AS x, ya AS y,
             CASE WHEN dx >= dy THEN 2*dy - dx ELSE 2*dx - dy END AS bal,
             0 AS stp
      FROM pz WHERE dx <> 0 AND dy <> 0
      UNION ALL
      SELECT pid, dx, dy, incx, incy, xa, ya, xb, yb, za, zb,
             CASE WHEN dx >= dy THEN x + incx
                  ELSE x + CASE WHEN bal >= 0 THEN incx ELSE 0 END END,
             CASE WHEN dx >= dy
                  THEN y + CASE WHEN bal >= 0 THEN incy ELSE 0 END
                  ELSE y + incy END,
             CASE WHEN dx >= dy
                  THEN bal - CASE WHEN bal >= 0 THEN 2*dx ELSE 0 END + 2*dy
                  ELSE bal - CASE WHEN bal >= 0 THEN 2*dy ELSE 0 END + 2*dx
             END,
             stp + 1
      FROM walk WHERE (dx >= dy AND x <> xb) OR (dx < dy AND y <> yb)
    ),
    pts AS (
      SELECT pid, x, y, stp,
             za + SQRT(CAST((x - xa)*(x - xa) + (y - ya)*(y - ya) AS DOUBLE)
                       / ((xb - xa)*(xb - xa) + (yb - ya)*(yb - ya)))
                  * (zb - za) AS zt
      FROM walk
      UNION ALL
      SELECT p.pid, s.i AS x, p.ya AS y, ABS(s.i - p.xa) AS stp,
             p.za + (CAST(s.i - p.xa AS DOUBLE) / (p.xb - p.xa))
                    * (p.zb - p.za) AS zt
      FROM pz p, generate_series(0, {GW - 1}) s(i)
      WHERE p.dy = 0 AND p.dx <> 0
        AND s.i BETWEEN LEAST(p.xa, p.xb) AND GREATEST(p.xa, p.xb)
      UNION ALL
      SELECT p.pid, p.xa AS x, s.i AS y, ABS(s.i - p.ya) AS stp,
             p.za + (CAST(s.i - p.ya AS DOUBLE) / (p.yb - p.ya))
                    * (p.zb - p.za) AS zt
      FROM pz p, generate_series(0, {GW - 1}) s(i)
      WHERE p.dx = 0 AND p.dy <> 0
        AND s.i BETWEEN LEAST(p.ya, p.yb) AND GREATEST(p.ya, p.yb)
    ),
    fails AS (
      SELECT pts.pid, pts.x, pts.y, pts.stp
      FROM pts JOIN gpx g ON g.r = pts.y AND g.c = pts.x
      WHERE NOT (pts.zt > g.v)
    ),
    first_fail AS (
      SELECT pid, x, y, stp FROM fails
      QUALIFY ROW_NUMBER() OVER (PARTITION BY pid ORDER BY stp) = 1
    ),
    -- Bresenham2D quirk (los.cpp:76-87,106): after a mid-walk
    -- failure the loop still advances and the unconditional
    -- post-loop test runs on the NEXT cell; if that cell also fails
    -- its coordinates OVERWRITE the intersection.  Axis-aligned
    -- scans return immediately, so only the general path applies.
    eff_fail AS (
      SELECT f.pid,
             CASE WHEN p.dx <> 0 AND p.dy <> 0 AND n.pid IS NOT NULL
                  THEN n.x ELSE f.x END AS x,
             CASE WHEN p.dx <> 0 AND p.dy <> 0 AND n.pid IS NOT NULL
                  THEN n.y ELSE f.y END AS y
      FROM first_fail f
      JOIN pz p ON p.pid = f.pid
      LEFT JOIN fails n ON n.pid = f.pid AND n.stp = f.stp + 1
    )
    SELECT p.pid,
           (p.za > p.va AND p.zb > p.vb AND f.pid IS NULL) AS visible,
           CAST(CASE WHEN NOT p.za > p.va THEN p.xa
                     WHEN NOT p.zb > p.vb THEN p.xb
                     WHEN f.pid IS NOT NULL THEN f.x
                     ELSE -1 END AS BIGINT) AS ix,
           CAST(CASE WHEN NOT p.za > p.va THEN p.ya
                     WHEN NOT p.zb > p.vb THEN p.yb
                     WHEN f.pid IS NOT NULL THEN f.y
                     ELSE -1 END AS BIGINT) AS iy
    FROM pz p LEFT JOIN eff_fail f ON f.pid = p.pid
    ORDER BY p.pid
    """,
    desc="batch line-of-sight (GDALIsLineOfSightVisible, alg/los.cpp:"
         "136-370): per-pair bbox tile gather + Bresenham kernel; oracle "
         "re-derives the Bresenham walk as a recursive CTE",
)
def los_q(spark, sf_dir):
    from ..operators.viewshed import los_pairs

    rows = []
    for k in range(_N_PAIRS):
        xa, ya, za, xb, yb, zb = _pair_params(k)
        rows.append({"pid": k, "xa": xa, "ya": ya, "za": za,
                     "xb": xb, "yb": yb, "zb": zb})
    pairs = spark.createDataFrame(pd.DataFrame(rows))
    out = los_pairs(_pixel_tiles_df(spark), pairs, tile_size=GW // 2)
    return out.select("pid", "visible", "ix", "iy").orderBy("pid")


def _viewshed_golden_sql() -> str:
    from ..kernels import viewshed as kvs

    grid = ((np.arange(GW * GW).reshape(GW, GW) * 7) % 256).astype(np.float64)
    rows = []
    for oid, opx, opy in _OBSERVERS:
        vis = kvs.viewshed(grid, opx, opy, observer_z=_OBS_Z)
        for r in range(GW):
            mask = vis[r] != 0
            rows.append((oid, r, int(mask.sum()),
                         int(np.where(mask, np.arange(GW), 0).sum())))
    vals = ", ".join(f"({o}, {r}, {n}, {s})" for o, r, n, s in rows)
    return (f"SELECT CAST(oid AS BIGINT) AS oid, CAST(r AS BIGINT) AS r, "
            f"CAST(visible_in_row AS BIGINT) AS visible_in_row, "
            f"CAST(col_sum AS BIGINT) AS col_sum "
            f"FROM (VALUES {vals}) AS t(oid, r, visible_in_row, col_sum) "
            f"ORDER BY oid, r")


_CURVE = dict(out_mode="ground", curve_coeff=0.85714, cell_sx=900.0,
              cell_sy=900.0, max_distance=900.0 * GW)


def _viewshed_curved_golden_sql() -> str:
    """FORMULA-DIFF vs alg/viewshed/viewshed_executor.cpp: the kernel
    transcribes setOutput's non-Normal branch (:179-192, result +=
    z - cell then clamp at 0, base = 0 in Ground mode), the
    height-adjustment factor curve_coeff/(2*semi_major) (:150-171)
    and the curvature term heightAdjFactor*r^2 with geotransform
    ground offsets (:280-316); max-distance cells are post-masked,
    faithful because in-range recurrence inputs are always in range
    (module docstring).  Covered serially by
    test_viewshed.py::test_{ground_mode,dem_mode,curvature}* — this
    VALUES oracle pins the distributed gather to that kernel."""
    from ..kernels import viewshed as kvs

    grid = ((np.arange(GW * GW).reshape(GW, GW) * 7) % 256).astype(np.float64)
    rows = []
    for oid, opx, opy in _OBSERVERS:
        g = kvs.viewshed(grid, opx, opy, observer_z=_OBS_Z, **_CURVE)
        for r in range(GW):
            rows.append((oid, r, int((g[r] == 0).sum()),
                         int(round(float(g[r].sum()) * 1000.0))))
    vals = ", ".join(f"({o}, {r}, {n}, {s})" for o, r, n, s in rows)
    return (f"SELECT CAST(oid AS BIGINT) AS oid, CAST(r AS BIGINT) AS r, "
            f"CAST(visible_in_row AS BIGINT) AS visible_in_row, "
            f"CAST(ground_milli AS BIGINT) AS ground_milli "
            f"FROM (VALUES {vals}) AS t(oid, r, visible_in_row, ground_milli) "
            f"ORDER BY oid, r")


@register(
    "viewshed",
    sql=_viewshed_golden_sql,
    desc="multi-observer viewshed (alg/viewshed/viewshed_executor.cpp "
         "reference-plane sweep, Edge cell mode): per-observer covering-"
         "tile gather + serial kernel per Arrow group; sequential "
         "recurrence is not SQL-expressible -> serial-golden VALUES "
         "oracle over per-row visibility aggregates",
)
def viewshed_q(spark, sf_dir):
    from ..operators.viewshed import viewshed_points

    obs = spark.createDataFrame(pd.DataFrame(
        [{"oid": o, "px": x, "py": y} for o, x, y in _OBSERVERS]))
    out = viewshed_points(_pixel_tiles_df(spark), obs, tile_size=GW // 2,
                          radius_px=GW, observer_z=_OBS_Z,
                          raster_w=GW, raster_h=GW)

    def _rows(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                vis = np.frombuffer(rr["vis"], dtype=np.uint8).reshape(
                    int(rr["h"]), int(rr["w"]))
                for r in range(int(rr["h"])):
                    mask = vis[r] != 0
                    yield pd.DataFrame({
                        "oid": [int(rr["oid"])],
                        "r": [int(rr["y0"]) + r],
                        "visible_in_row": [int(mask.sum())],
                        "col_sum": [int(np.where(
                            mask, np.arange(int(rr["w"])) + int(rr["x0"]),
                            0).sum())],
                    })

    return out.mapInPandas(
        _rows, "oid long, r long, visible_in_row long, col_sum long"
    ).orderBy("oid", "r")


@register(
    "viewshed_curved",
    sql=_viewshed_curved_golden_sql,
    desc="multi-observer viewshed, Ground output mode + curved-earth "
         "adjustment + max distance (viewshed_executor.cpp setOutput "
         ":179-192, calcHeightAdjFactor :150-171, adjustHeight "
         ":268-316): float64 required-height windows assembled "
         "distributed, serial-golden VALUES oracle over per-row "
         "visible counts and milli-scaled height sums",
)
def viewshed_curved_q(spark, sf_dir):
    from ..operators.viewshed import viewshed_points

    obs = spark.createDataFrame(pd.DataFrame(
        [{"oid": o, "px": x, "py": y} for o, x, y in _OBSERVERS]))
    out = viewshed_points(_pixel_tiles_df(spark), obs, tile_size=GW // 2,
                          radius_px=GW, observer_z=_OBS_Z,
                          raster_w=GW, raster_h=GW, **_CURVE)

    def _rows(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                g = np.frombuffer(rr["vis"], dtype=np.float64).reshape(
                    int(rr["h"]), int(rr["w"]))
                for r in range(int(rr["h"])):
                    yield pd.DataFrame({
                        "oid": [int(rr["oid"])],
                        "r": [int(rr["y0"]) + r],
                        "visible_in_row": [int((g[r] == 0).sum())],
                        "ground_milli": [int(round(float(g[r].sum())
                                                   * 1000.0))],
                    })

    return out.mapInPandas(
        _rows, "oid long, r long, visible_in_row long, ground_milli long"
    ).orderBy("oid", "r")


_CUM_SPACING = 16


def _cumulative_golden_sql() -> str:
    """FORMULA-DIFF vs alg/viewshed/cumulative.cpp: observers at every
    (x % spacing == 0, y % spacing == 0) (:64-68); executors run
    Normal mode with visible = 1 (:46-47); uint32 per-pixel sum;
    scaleOutput (:200-213) rescales floor(255/max * v), no-op when
    max == 0.  This VALUES oracle composes the SAME serial per-
    observer kernel already pinned by the viewshed golden + the
    sum/scale formula above — independent of the distributed
    fragment/rollup machinery under test."""
    from ..kernels import viewshed as kvs

    grid = ((np.arange(GW * GW).reshape(GW, GW) * 7) % 256).astype(np.float64)
    acc = np.zeros((GW, GW), dtype=np.uint32)
    for x in range(0, GW, _CUM_SPACING):
        for y in range(0, GW, _CUM_SPACING):
            vis = kvs.viewshed(grid, x, y, observer_z=_OBS_Z)
            acc += (vis != 0).astype(np.uint32)
    m = int(acc.max())
    if m:
        acc = np.floor((255.0 / m) * acc).astype(np.uint32)
    rows = []
    for r in range(GW):
        rows.append((r, int(acc[r].sum()),
                     int((acc[r].astype(np.int64)
                          * np.arange(GW, dtype=np.int64)).sum())))
    vals = ", ".join(f"({r}, {s}, {ws})" for r, s, ws in rows)
    return (f"SELECT CAST(r AS BIGINT) AS r, CAST(row_sum AS BIGINT) AS "
            f"row_sum, CAST(col_weighted AS BIGINT) AS col_weighted "
            f"FROM (VALUES {vals}) AS t(r, row_sum, col_weighted) "
            f"ORDER BY r")


@register(
    "viewshed_cumulative",
    sql=_cumulative_golden_sql,
    desc="cumulative viewshed (alg/viewshed/cumulative.cpp): grid "
         "observers -> Normal-mode masks summed uint32 per pixel -> "
         "floor(255/max*v) rescale; distributed as tile-aligned "
         "fragment rollup (the reference's Combiner/rollup pipeline "
         "shape); VALUES oracle composes the serial kernel + sum/scale "
         "formula",
)
def viewshed_cumulative_q(spark, sf_dir):
    from ..operators.viewshed import cumulative_viewshed

    ts = GW // 2
    out = cumulative_viewshed(_pixel_tiles_df(spark), GW, GW,
                              _CUM_SPACING, tile_size=ts,
                              observer_z=_OBS_Z)

    def _rows(batches):
        for pdf in batches:
            for _, rr in pdf.iterrows():
                a = np.frombuffer(rr["px"], dtype=np.uint32).reshape(ts, ts)
                for r in range(ts):
                    cols = np.arange(ts, dtype=np.int64) + int(rr["tx"]) * ts
                    yield pd.DataFrame({
                        "r": [int(rr["ty"]) * ts + r],
                        "row_sum": [int(a[r].sum())],
                        "col_weighted": [int((a[r].astype(np.int64)
                                              * cols).sum())]})

    part = out.mapInPandas(
        _rows, "r long, row_sum long, col_weighted long")
    return (part.groupBy("r")
            .agg(F.sum("row_sum").alias("row_sum"),
                 F.sum("col_weighted").alias("col_weighted"))
            .orderBy("r"))

"""Gridding battery: IDW / nearest / metrics / moving average per
output cell, oracle-checked against direct point-cell distance SQL.

Spark inverts the reference's per-cell quadtree scan into a
point->cell-disk explode + groupBy; the oracle brute-forces every
(cell, point) pair — identical result sets prove the disk join loses
no candidates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from . import _derive as dv
from .spatial import _points
from ..operators import grid_interp as gi

GZ = 4
GN = (1 << GZ) - 1
RADIUS_CELLS = 1

_TS = dv.GRID.tile_span(GZ)
_R2 = float(RADIUS_CELLS * _TS) ** 2

# NOTE: DuckDB types bare float literals as DECIMAL; every grid
# constant is cast to DOUBLE so both engines run the same IEEE ops.
_CX = (f"({dv.GRID.top_left_x!r}::DOUBLE"
       f" + (CAST(t1.i AS DOUBLE) + 0.5) * {_TS!r}::DOUBLE)")
_CY = (f"({dv.GRID.top_left_y!r}::DOUBLE"
       f" - (CAST(t2.i AS DOUBLE) + 0.5) * {_TS!r}::DOUBLE)")

_PAIRS = f"""
    pts AS ({dv.points_sql()}),
    ptv AS (
      SELECT doc_id AS pid, x, y,
             CAST((doc_id * 7919) % 256 AS DOUBLE) AS v
      FROM pts
    ),
    pairs AS (
      SELECT t1.i AS ctx, t2.i AS cty, p.pid, p.v,
             ((p.x - {_CX}) * (p.x - {_CX})
              + (p.y - {_CY}) * (p.y - {_CY})) AS d2
      FROM ptv p, generate_series(0, {GN}) t1(i), generate_series(0, {GN}) t2(i)
    ),
    inr AS (SELECT * FROM pairs WHERE d2 <= {_R2!r}::DOUBLE)
"""


def _pts_v(spark, sf_dir):
    return _points(spark, sf_dir).select(
        F.col("doc_id").alias("pid"), "x", "y",
        ((F.col("doc_id") * 7919) % 256).cast("double").alias("v"),
    )


@register(
    "grid_idw",
    sql=f"""
    WITH {_PAIRS}
    SELECT ctx, cty,
           ROUND(SUM(v * power(d2, -1.0)) / SUM(power(d2, -1.0)), 6) AS idw,
           COUNT(*) AS n_pts
    FROM inr GROUP BY ctx, cty
    ORDER BY ctx, cty
    """,
    desc="IDW gridding (gdalgrid.cpp:109): point->cell-disk explode + "
         "Column-only weighted aggregation, zero Python",
)
def grid_idw_q(spark, sf_dir):
    out = gi.grid_idw(_pts_v(spark, sf_dir), dv.GRID, GZ,
                      radius_cells=RADIUS_CELLS)
    return out.select(
        "ctx", "cty", F.round("idw", 6).alias("idw"), "n_pts"
    ).orderBy("ctx", "cty")


@register(
    "grid_nearest",
    sql=f"""
    WITH {_PAIRS},
    r AS (
      SELECT ctx, cty, v AS nearest, d2 AS dist2,
             ROW_NUMBER() OVER (PARTITION BY ctx, cty ORDER BY d2, pid) AS rn
      FROM inr
    )
    SELECT ctx, cty, nearest, dist2 FROM r WHERE rn = 1
    ORDER BY ctx, cty
    """,
    desc="nearest-point gridding with (dist, pid) ties (gdalgrid.cpp:879)",
)
def grid_nearest_q(spark, sf_dir):
    out = gi.grid_nearest(_pts_v(spark, sf_dir), dv.GRID, GZ,
                          radius_cells=RADIUS_CELLS)
    return out.select("ctx", "cty", "nearest", "dist2").orderBy("ctx", "cty")


@register(
    "grid_metrics",
    sql=f"""
    WITH {_PAIRS}
    SELECT ctx, cty, COUNT(*) AS n_pts,
           MIN(v) AS vmin, MAX(v) AS vmax, MAX(v) - MIN(v) AS vrange,
           ROUND(AVG(sqrt(d2)), 6) AS avg_dist
    FROM inr GROUP BY ctx, cty
    ORDER BY ctx, cty
    """,
    desc="per-cell data metrics: count/min/max/range/avg-distance "
         "(gdalgrid.cpp:1033+, gdal_alg.h:402-416)",
)
def grid_metrics_q(spark, sf_dir):
    out = gi.grid_metrics(_pts_v(spark, sf_dir), dv.GRID, GZ,
                          radius_cells=RADIUS_CELLS)
    return out.select(
        "ctx", "cty", "n_pts", "vmin", "vmax", "vrange",
        F.round("avg_dist", 6).alias("avg_dist"),
    ).orderBy("ctx", "cty")


@register(
    "grid_moving_average",
    sql=f"""
    WITH {_PAIRS}
    SELECT ctx, cty, ROUND(AVG(v), 6) AS avg_v, COUNT(*) AS n_pts
    FROM inr GROUP BY ctx, cty
    ORDER BY ctx, cty
    """,
    desc="moving-average gridding (gdalgrid.cpp:629)",
)
def grid_moving_average_q(spark, sf_dir):
    out = gi.grid_moving_average(_pts_v(spark, sf_dir), dv.GRID, GZ,
                                 radius_cells=RADIUS_CELLS)
    return out.select(
        "ctx", "cty", F.round("avg_v", 6).alias("avg_v"), "n_pts"
    ).orderBy("ctx", "cty")


@register(
    "grid_invdistnn",
    sql=f"""
    WITH {_PAIRS},
    rk AS (
      SELECT ctx, cty, v, d2,
             ROW_NUMBER() OVER (PARTITION BY ctx, cty
                                ORDER BY d2, v, pid) AS rn
      FROM inr
    )
    SELECT ctx, cty,
           ROUND(SUM((1.0 / power(d2, 1.0)) * v)
                 / SUM(1.0 / power(d2, 1.0)), 6) AS idwnn,
           COUNT(*) AS n_used
    FROM rk WHERE rn <= 8
    GROUP BY ctx, cty ORDER BY ctx, cty
    """,
    desc="IDW over the nearest max_points=8 neighbors "
         "(gdalgrid.cpp:241 invdistnn): radius-filtered candidates "
         "sorted by smoothed distance, ordered JVM fold matching the "
         "reference's ascending-multimap accumulation",
)
def grid_invdistnn_q(spark, sf_dir):
    out = gi.grid_invdistnn(_pts_v(spark, sf_dir), dv.GRID, GZ,
                            radius_cells=RADIUS_CELLS, power=2.0,
                            smoothing=0.0, max_points=8)
    return out.select(
        "ctx", "cty", F.round("idwnn", 6).alias("idwnn"), "n_used"
    ).orderBy("ctx", "cty")

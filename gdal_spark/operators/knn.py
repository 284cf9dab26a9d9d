"""Exact k-nearest-neighbor join via cell-disk candidate expansion.

Distributed rendering of GDAL's nearest-neighbor search, which grows
a quadtree search radius until the neighbor is guaranteed
(/root/reference/alg/gdalgrid.cpp:879-998, radius-growth loop
:909-920; quadtree /root/reference/port/cpl_quad_tree.cpp):

  1. index points by cell (z, tx, ty) — pure Column math;
  2. per query, candidates = all points in the Chebyshev disk of
     radius r around the query's cell (JVM-side sequence+explode,
     equi-join on the packed cell id — never a theta join);
  3. top-k by (dist2, pid) with row_number — deterministic ties;
  4. exactness guarantee: a point outside the disk is at distance
     >= r * tile_span from the query, so any query whose k-th
     candidate distance exceeds that bound is re-run with doubled
     radius (driver loop over DataFrame ops; converges in O(log)
     rounds, each fully distributed).

Scale note: the candidate join is an equi-join on cell id — at 10^12
points it shuffles by cell (or broadcasts the query side when small),
and the disk explode multiplies only the small query side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .. import functions as gf
from ..kernels.cells import TileGrid


def _with_cell_xy(df: DataFrame, grid: TileGrid, zoom: int, px: str, py: str,
                  prefix: str) -> DataFrame:
    tx, ty = gf.tile_xy_cols(grid, zoom, F.col(px), F.col(py))
    return df.withColumn(f"{prefix}tx", tx).withColumn(f"{prefix}ty", ty)


def _candidates(points: DataFrame, queries: DataFrame, grid: TileGrid,
                zoom: int, r: int) -> DataFrame:
    """Disk-join: queries exploded to their radius-r cell disk, then
    equi-joined to points on the packed cell id."""
    n = (1 << zoom) - 1
    dx = F.explode(F.sequence(F.lit(-r), F.lit(r))).alias("dx")
    q = queries.select("*", dx)
    dy = F.explode(F.sequence(F.lit(-r), F.lit(r))).alias("dy")
    q = q.select("*", dy)
    q = (
        q.withColumn("ctx", F.col("qtx") + F.col("dx"))
        .withColumn("cty", F.col("qty") + F.col("dy"))
        .filter(
            (F.col("ctx") >= 0) & (F.col("ctx") <= n)
            & (F.col("cty") >= 0) & (F.col("cty") <= n)
        )
        .withColumn("ccell", gf.pack_cell_col(zoom, F.col("ctx"), F.col("cty")))
        .drop("dx", "dy", "ctx", "cty")
    )
    pts = points.withColumn(
        "ccell", gf.pack_cell_col(zoom, F.col("ptx"), F.col("pty"))
    )
    return q.join(pts, "ccell", "inner").drop("ccell")


def knn_join(points: DataFrame, queries: DataFrame, grid: TileGrid,
             k: int = 5, zoom: int = 4, r0: int = 2,
             max_rounds: int = 8) -> DataFrame:
    """Exact kNN of each query row against the point table.

    points  : DF(pid bigint, x double, y double)
    queries : DF(qid bigint, qx double, qy double)
    returns : DF(qid, rank, pid, dist2) — rank 1..k by (dist2, pid).
    """
    pts = _with_cell_xy(points, grid, zoom, "x", "y", "p")
    qry = _with_cell_xy(queries, grid, zoom, "qx", "qy", "q")
    ts = grid.tile_span(zoom)

    w = Window.partitionBy("qid").orderBy(F.col("dist2").asc(), F.col("pid").asc())
    result = None
    pending = qry
    r = r0
    for _ in range(max_rounds):
        cand = _candidates(pts, pending, grid, zoom, r)
        d2 = (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx")) + (
            F.col("y") - F.col("qy")
        ) * (F.col("y") - F.col("qy"))
        topk = (
            cand.withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        # guarantee bound: points outside the radius-r disk are at
        # distance >= r*ts; a query is settled iff it found k
        # candidates and its k-th distance is within the bound.
        per_q = topk.groupBy("qid").agg(
            F.count("*").alias("_n"), F.max("dist2").alias("_kd2")
        )
        bound = float(r * ts) ** 2
        settled_ids = per_q.filter(
            (F.col("_n") >= k) & (F.col("_kd2") <= F.lit(bound))
        ).select("qid")
        settled = topk.join(F.broadcast(settled_ids), "qid", "left_semi").select(
            "qid", "rank", "pid", "dist2"
        )
        result = settled if result is None else result.unionByName(settled)
        pending = pending.join(F.broadcast(settled_ids), "qid", "left_anti")
        if pending.isEmpty():
            break
        r *= 2
        n_side = 1 << zoom
        if r > 2 * n_side:
            # disk covers the whole grid: final exact pass, no bound check
            cand = _candidates(pts, pending, grid, zoom, r)
            topk = (
                cand.withColumn("dist2", d2)
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("qid", "rank", "pid", "dist2")
            )
            result = topk if result is None else result.unionByName(topk)
            break
    return result

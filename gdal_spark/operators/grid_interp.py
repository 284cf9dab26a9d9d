"""Gridding / interpolation: scattered points -> regular cell grid.

The Spark rendering of GDALGrid (/root/reference/alg/gdalgrid.cpp):
IDW (:109), nearest (:879, radius-growth :909-920), moving average
(:629), data metrics (:1033+).  The reference scans a quadtree per
output cell; distributed, we invert it: each point explodes to the
disk of output cells it can influence (JVM sequence explode, bounded
by radius_cells), then one groupBy(cell) computes the kernel as pure
Column aggregates — no Python anywhere, map-side partial
aggregation, shuffle keyed by output cell.

Weights and distances are plain IEEE Column arithmetic, so every
operator here is oracle-checkable in SQL (sums rounded to heal
summation-order ulps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .. import functions as gf
from ..kernels.cells import TileGrid

# grid_linear's Delaunay runs on the driver (the reference's own shape:
# qhull triangulates the full point array serially before gridding,
# alg/delaunay.c:107).  2M points ≈ a few hundred MB of driver state —
# ample for gridding workloads, a hard error beyond it.
MAX_DRIVER_TIN_POINTS = 2_000_000


def _cells_around_points(points: DataFrame, grid: TileGrid, zoom: int,
                         radius_cells: int) -> DataFrame:
    """Each point row replicated to every cell in its Chebyshev disk,
    with the cell-center coordinates and the point->center distance."""
    n = (1 << zoom) - 1
    ts = grid.tile_span(zoom)
    tx, ty = gf.tile_xy_cols(grid, zoom, F.col("x"), F.col("y"))
    pts = points.withColumn("ptx", tx).withColumn("pty", ty)
    r = radius_cells
    pts = pts.select(
        "*", F.explode(F.sequence(F.lit(-r), F.lit(r))).alias("dx"))
    pts = pts.select(
        "*", F.explode(F.sequence(F.lit(-r), F.lit(r))).alias("dy"))
    pts = (
        pts.withColumn("ctx", F.col("ptx") + F.col("dx"))
        .withColumn("cty", F.col("pty") + F.col("dy"))
        .filter((F.col("ctx") >= 0) & (F.col("ctx") <= n)
                & (F.col("cty") >= 0) & (F.col("cty") <= n))
        .drop("dx", "dy", "ptx", "pty")
    )
    cx = F.lit(grid.top_left_x) + (F.col("ctx").cast("double") + 0.5) * F.lit(ts)
    cy = F.lit(grid.top_left_y) - (F.col("cty").cast("double") + 0.5) * F.lit(ts)
    d2 = (F.col("x") - cx) * (F.col("x") - cx) + (F.col("y") - cy) * (F.col("y") - cy)
    return pts.withColumn("cx", cx).withColumn("cy", cy).withColumn("d2", d2)


def grid_idw(points: DataFrame, grid: TileGrid, zoom: int,
             radius_cells: int = 1, power: float = 2.0,
             value_col: str = "v") -> DataFrame:
    """Inverse-distance-weighted interpolation per output cell
    (gdalgrid.cpp:109 GDALGridInverseDistanceToAPower, radius-bounded):
    idw = sum(v / d^p) / sum(1 / d^p) over points within the radius;
    a point exactly on the center (d2 == 0) wins outright (the
    reference's dfR2 == 0 shortcut)."""
    ts = grid.tile_span(zoom)
    radius2 = float(radius_cells * ts) ** 2
    cand = _cells_around_points(points, grid, zoom, radius_cells).filter(
        F.col("d2") <= F.lit(radius2))
    w = F.pow(F.col("d2"), F.lit(-power / 2.0))
    agg = cand.groupBy("ctx", "cty").agg(
        F.sum(F.when(F.col("d2") == 0, 0.0)
              .otherwise(w * F.col(value_col))).alias("wv"),
        F.sum(F.when(F.col("d2") == 0, 0.0).otherwise(w)).alias("ws"),
        F.min(F.when(F.col("d2") == 0, F.col(value_col))).alias("exact"),
        F.count("*").alias("n_pts"),
    )
    idw = F.when(F.col("exact").isNotNull(), F.col("exact")).otherwise(
        F.col("wv") / F.col("ws"))
    return agg.select("ctx", "cty", idw.alias("idw"), "n_pts")


def grid_nearest(points: DataFrame, grid: TileGrid, zoom: int,
                 radius_cells: int = 1, value_col: str = "v",
                 id_col: str = "pid") -> DataFrame:
    """Nearest-point value per output cell within the radius —
    (d2, pid) deterministic ties (gdalgrid.cpp:879)."""
    ts = grid.tile_span(zoom)
    radius2 = float(radius_cells * ts) ** 2
    cand = _cells_around_points(points, grid, zoom, radius_cells).filter(
        F.col("d2") <= F.lit(radius2))
    win = Window.partitionBy("ctx", "cty").orderBy(
        F.col("d2").asc(), F.col(id_col).asc())
    return (
        cand.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("ctx", "cty", F.col(value_col).alias("nearest"),
                F.col("d2").alias("dist2"))
    )


def grid_metrics(points: DataFrame, grid: TileGrid, zoom: int,
                 radius_cells: int = 1, value_col: str = "v") -> DataFrame:
    """Per-cell data metrics within the radius: count / min / max /
    range / average distance (gdalgrid.cpp:1033+, enum
    gdal_alg.h:402-416)."""
    ts = grid.tile_span(zoom)
    radius2 = float(radius_cells * ts) ** 2
    cand = _cells_around_points(points, grid, zoom, radius_cells).filter(
        F.col("d2") <= F.lit(radius2))
    return cand.groupBy("ctx", "cty").agg(
        F.count("*").alias("n_pts"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
        (F.max(value_col) - F.min(value_col)).alias("vrange"),
        F.avg(F.sqrt(F.col("d2"))).alias("avg_dist"),
    )


def grid_moving_average(points: DataFrame, grid: TileGrid, zoom: int,
                        radius_cells: int = 1,
                        value_col: str = "v") -> DataFrame:
    """Arithmetic mean of values within the radius (gdalgrid.cpp:629)."""
    ts = grid.tile_span(zoom)
    radius2 = float(radius_cells * ts) ** 2
    cand = _cells_around_points(points, grid, zoom, radius_cells).filter(
        F.col("d2") <= F.lit(radius2))
    return cand.groupBy("ctx", "cty").agg(
        F.avg(value_col).alias("avg_v"),
        F.count("*").alias("n_pts"),
    )


def grid_invdistnn(points: DataFrame, grid: TileGrid, zoom: int,
                   radius_cells: int = 1, power: float = 2.0,
                   smoothing: float = 0.0, max_points: int = 12,
                   min_points: int = 0, value_col: str = "v",
                   id_col: str = "pid") -> DataFrame:
    """IDW restricted to the nearest ``max_points`` neighbors
    (gdalgrid.cpp:241 GDALGridInverseDistanceToAPowerNearestNeighbor):
    candidates within the REAL radius (d2 <= radius^2, :296-300) are
    ordered by smoothed distance r2 = d2 + smoothing^2 (the multimap
    at :266,298), the closest max_points kept (:323-328), and the
    weights w = 1 / r2^(p/2) accumulated IN ASCENDING DISTANCE ORDER
    (:319-325) — reproduced exactly by an array_sort + F.aggregate
    ordered fold, so the float result bit-matches the serial loop.
    A point with r2 < 1e-13 short-circuits to its value (:288-293;
    the reference takes quadtree iteration order on ties — we take
    the (d2, pid) minimum, identical whenever the hit is unique).
    Cells with fewer than min_points neighbors emit no row (the
    reference writes NoData, :331).

    Scale shape: identical to grid_idw — points explode to their
    cell disk, one shuffle keyed by output cell; the per-cell
    neighbor list is bounded by the radius, the sort/fold is a JVM
    higher-order function, no Python.
    """
    ts = grid.tile_span(zoom)
    radius2 = float(radius_cells * ts) ** 2
    s2 = float(smoothing) * float(smoothing)
    cand = _cells_around_points(points, grid, zoom, radius_cells).filter(
        F.col("d2") <= F.lit(radius2))
    cand = cand.withColumn("_rs2", F.col("d2") + F.lit(s2))

    agg = cand.groupBy("ctx", "cty").agg(
        F.min(F.when(F.col("_rs2") < 1e-13,
                     F.struct(F.col("d2").alias("d2"),
                              F.col(id_col).alias("pid"),
                              F.col(value_col).alias("z")))).alias("_hit"),
        # exact-hit points are excluded from the neighbor list: the
        # reference returns before inserting them (:288-293), and at
        # r2 == 0 the weight would divide by zero
        F.array_sort(F.collect_list(F.when(
            F.col("_rs2") >= 1e-13,
            F.struct(F.col("_rs2").alias("r2"),
                     F.col(value_col).alias("z"),
                     F.col(id_col).alias("pid"))))).alias("_nbrs"),
    )
    kept = F.slice(F.col("_nbrs"), 1, max_points) if max_points > 0 \
        else F.col("_nbrs")
    half_p = float(power) / 2.0
    fold = F.aggregate(
        kept,
        F.struct(F.lit(0.0).alias("nom"), F.lit(0.0).alias("den"),
                 F.lit(0).cast("long").alias("n")),
        lambda acc, x: F.struct(
            (acc["nom"] + (F.lit(1.0) / F.pow(x["r2"], F.lit(half_p)))
             * x["z"]).alias("nom"),
            (acc["den"] + F.lit(1.0)
             / F.pow(x["r2"], F.lit(half_p))).alias("den"),
            (acc["n"] + 1).alias("n")))
    out = agg.withColumn("_f", fold)
    val = F.when(F.col("_hit").isNotNull(), F.col("_hit")["z"]).otherwise(
        F.col("_f")["nom"] / F.col("_f")["den"])
    ok = F.col("_hit").isNotNull() | (
        (F.col("_f")["n"] >= F.lit(int(min_points)))
        & (F.col("_f")["den"] != 0.0))
    return (out.filter(ok)
            .select("ctx", "cty", val.alias("idwnn"),
                    F.col("_f")["n"].alias("n_used")))


BARY_EPS = 1e-10     # facet-walk containment tolerance (delaunay.c:402)


def grid_linear(points: DataFrame, grid: TileGrid, zoom: int,
                value_col: str = "v", id_col: str = "pid",
                fallback: str = "nearest") -> DataFrame:
    """Linear (TIN) interpolation — gdal_grid -a linear
    (GDALGridLinear, gdalgrid.cpp:2459): each output cell takes the
    barycentric interpolation of the Delaunay facet containing its
    center; cells outside the hull fall back to the global nearest
    point (the dfRadius<0 branch, :2502-2528) or to no row at all
    (``fallback="none"``, the dfRadius==0 NoData branch).

    Spark-first split, mirroring the reference's own asymmetry
    (qhull triangulates the whole point array in memory before any
    cell is gridded, :3152-3166):

    * the POINT side is bounded: one ordered collect, a driver
      Bowyer-Watson (kernels/delaunay.py), and per-facet
      barycentric coefficients in the reference's literal formula
      (GDALTriangulationComputeBarycentricCoefficients,
      delaunay.c:339-344) — O(points) driver state, exactly what
      the serial reference holds;
    * the CELL side — the 100-TB side — is fully distributed: the
      (small) facet table explodes to the cells of each facet's
      bbox (a superset of containment), candidates filter on the
      JVM barycentric containment test (lambda_i >= -1e-10,
      FindFacetDirected's acceptance, delaunay.c:402,446-457),
      ties on shared edges break to the lexicographically first
      facet, and the interpolation is one fused Column expression.
      No Python touches per-cell data; the only shuffle is the
      per-cell tie-break aggregation.

    Hull-exterior cells use the (d2, pid) nearest rule of
    grid_nearest with an unbounded radius over the broadcast point
    table (the reference's quadtree scan order decides its ties
    instead; identical whenever the nearest hit is unique).
    """
    from ..kernels.delaunay import delaunay_triangles

    spark = points.sparkSession
    # the driver TIN is faithful to the reference's global qhull pass
    # but must stay bounded: LIMIT cap+1 BEFORE the collect so an
    # oversized point layer raises instead of silently OOMing the
    # driver (mirrors similarity.MAX_DRIVER_CENTROIDS)
    probe = (points.select(id_col).limit(MAX_DRIVER_TIN_POINTS + 1)
             .count())
    if probe > MAX_DRIVER_TIN_POINTS:
        raise ValueError(
            f"grid_linear triangulates on the driver (reference "
            f"semantics: global qhull TIN, alg/delaunay.c:107) and the "
            f"point layer exceeds MAX_DRIVER_TIN_POINTS="
            f"{MAX_DRIVER_TIN_POINTS}; pre-aggregate the points (e.g. "
            "grid_moving_average / decimate per cell) or raise the cap "
            "explicitly if the driver has the memory")
    rows = (points.select(id_col, "x", "y", value_col)
            .orderBy(id_col).collect())
    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]
    zs = [r[value_col] for r in rows]
    pids = [r[id_col] for r in rows]
    tris = delaunay_triangles(xs, ys)

    nmax = (1 << zoom) - 1
    tri_rows = []
    for i, j, k in tris:
        x1, y1, z1 = xs[i], ys[i], zs[i]
        x2, y2, z2 = xs[j], ys[j], zs[j]
        x3, y3, z3 = xs[k], ys[k], zs[k]
        denom = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        if abs(denom) < 1e-5:       # degenerate facet (delaunay.c:328)
            continue
        tx0, ty0, tx1, ty1 = grid.tile_range_for_bbox(
            zoom, min(x1, x2, x3), min(y1, y2, y3),
            max(x1, x2, x3), max(y1, y2, y3))
        tri_rows.append((
            int(pids[i]), int(pids[j]), int(pids[k]),
            (y2 - y3) / denom, (x3 - x2) / denom,
            (y3 - y1) / denom, (x1 - x3) / denom, x3, y3,
            float(z1), float(z2), float(z3),
            int(tx0), int(ty0), int(tx1), int(ty1)))
    tdf = spark.createDataFrame(tri_rows, _FACET_SCHEMA)
    pdf = spark.createDataFrame(
        list(zip(pids, xs, ys, [float(z) for z in zs])),
        f"{id_col} long, x double, y double, v double")
    return _facet_grid(spark, tdf, grid, zoom, fallback,
                       F.broadcast(pdf), id_col)


_FACET_SCHEMA = (
    "pa long, pb long, pc long, "
    "m1x double, m1y double, m2x double, m2y double, "
    "cstx double, csty double, z1 double, z2 double, z3 double, "
    "tx0 int, ty0 int, tx1 int, ty1 int")


def _facet_grid(spark, tdf: DataFrame, grid: TileGrid, zoom: int,
                fallback: str, near_pts, id_col: str) -> DataFrame:
    """Cell side of grid_linear, shared by the driver-TIN and tiled
    engines: facet table -> bbox-cell explode -> JVM barycentric
    containment -> (pa, pb, pc)-lexicographic tie-break -> fused
    interpolation Column; the same order the SQL oracle's
    ROW_NUMBER() OVER (ORDER BY i, j, k) uses."""
    ts = grid.tile_span(zoom)
    cand = (tdf
            .select("*", F.explode(F.sequence("tx0", "tx1")).alias("ctx"))
            .select("*", F.explode(F.sequence("ty0", "ty1")).alias("cty")))
    cx = F.lit(grid.top_left_x) + (F.col("ctx").cast("double") + 0.5) * F.lit(ts)
    cy = F.lit(grid.top_left_y) - (F.col("cty").cast("double") + 0.5) * F.lit(ts)
    l1 = F.col("m1x") * (cx - F.col("cstx")) + F.col("m1y") * (cy - F.col("csty"))
    l2 = F.col("m2x") * (cx - F.col("cstx")) + F.col("m2y") * (cy - F.col("csty"))
    l3 = F.lit(1.0) - l1 - l2
    inside = (cand
              .withColumn("l1", l1).withColumn("l2", l2).withColumn("l3", l3)
              .filter((F.col("l1") >= -BARY_EPS) & (F.col("l2") >= -BARY_EPS)
                      & (F.col("l3") >= -BARY_EPS)))
    win = Window.partitionBy("ctx", "cty").orderBy(
        F.col("pa").asc(), F.col("pb").asc(), F.col("pc").asc())
    tinned = (inside.withColumn("_rn", F.row_number().over(win))
              .filter(F.col("_rn") == 1)
              .select("ctx", "cty",
                      (F.col("l1") * F.col("z1") + F.col("l2") * F.col("z2")
                       + F.col("l3") * F.col("z3")).alias("linear"),
                      F.lit(True).alias("in_hull")))
    if fallback == "none":
        return tinned

    # hull-exterior cells: distributed cell universe anti-joined to
    # the TIN winners, then the global (d2, pid) nearest over the
    # broadcast point table
    side = 1 << zoom
    cells = (spark.range(side * side)
             .select((F.col("id") % side).cast("int").alias("ctx"),
                     (F.col("id") / side).cast("int").alias("cty")))
    missing = cells.join(tinned.select("ctx", "cty"), ["ctx", "cty"],
                         "left_anti")
    mcx = F.lit(grid.top_left_x) + (F.col("ctx").cast("double") + 0.5) * F.lit(ts)
    mcy = F.lit(grid.top_left_y) - (F.col("cty").cast("double") + 0.5) * F.lit(ts)
    scored = missing.join(near_pts).withColumn(
        "d2", (F.col("x") - mcx) * (F.col("x") - mcx)
        + (F.col("y") - mcy) * (F.col("y") - mcy))
    nwin = Window.partitionBy("ctx", "cty").orderBy(
        F.col("d2").asc(), F.col(id_col).asc())
    nearest = (scored.withColumn("_rn", F.row_number().over(nwin))
               .filter(F.col("_rn") == 1)
               .select("ctx", "cty", F.col("v").alias("linear"),
                       F.lit(False).alias("in_hull")))
    return tinned.unionByName(nearest)


def grid_linear_tiled(points: DataFrame, grid: TileGrid, zoom: int,
                      value_col: str = "v", id_col: str = "pid",
                      fallback: str = "nearest",
                      target_per_tile: int = 3000,
                      halo: float | None = None,
                      verify: bool = True) -> DataFrame:
    """grid_linear's scale engine: the TIN comes from the certified
    tiled Delaunay (operators/delaunay_dist.py) instead of the
    driver Bowyer-Watson, so the point layer is unbounded — no
    MAX_DRIVER_TIN_POINTS cap, no driver collect of the corpus.
    Output is identical to grid_linear for inputs in general
    position (both TINs are the exact Delaunay triangulation and the
    tie-break key is the same (pa, pb, pc) facet order).

    The facet table is built with three shuffle joins of the facet
    triples against the point layer (each keyed on one vertex pid).
    The ``fallback="nearest"`` hull-exterior pass broadcasts the
    point table — fine for gridding-sized layers; pass
    ``fallback="none"`` at corpus scale (hull-exterior cells are a
    raster-edge concern, reference dfRadius==0 branch)."""
    from .delaunay_dist import delaunay_tiled

    spark = points.sparkSession
    tris = delaunay_tiled(points, id_col=id_col,
                          target_per_tile=target_per_tile,
                          halo=halo, verify=verify)
    p = points.select(F.col(id_col).cast("long").alias("_pid"),
                      F.col("x").cast("double").alias("_x"),
                      F.col("y").cast("double").alias("_y"),
                      F.col(value_col).cast("double").alias("_v"))
    t = tris
    for v, pre in (("pa", "1"), ("pb", "2"), ("pc", "3")):
        t = (t.join(p, F.col(v) == F.col("_pid"))
             .drop("_pid")
             .withColumnRenamed("_x", f"x{pre}")
             .withColumnRenamed("_y", f"y{pre}")
             .withColumnRenamed("_v", f"z{pre}"))
    x1, y1 = F.col("x1"), F.col("y1")
    x2, y2 = F.col("x2"), F.col("y2")
    x3, y3 = F.col("x3"), F.col("y3")
    denom = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
    ts = grid.tile_span(zoom)
    nmax = (1 << zoom) - 1

    def _clx(c):
        return F.least(F.lit(nmax), F.greatest(F.lit(0), F.floor(
            (c - F.lit(grid.top_left_x)) / F.lit(ts)).cast("int")))

    def _cly(c):
        return F.least(F.lit(nmax), F.greatest(F.lit(0), F.floor(
            (F.lit(grid.top_left_y) - c) / F.lit(ts)).cast("int")))

    tdf = (t.withColumn("_den", denom)
           .filter(F.abs(F.col("_den")) >= 1e-5)
           .select(
               "pa", "pb", "pc",
               ((y2 - y3) / F.col("_den")).alias("m1x"),
               ((x3 - x2) / F.col("_den")).alias("m1y"),
               ((y3 - y1) / F.col("_den")).alias("m2x"),
               ((x1 - x3) / F.col("_den")).alias("m2y"),
               x3.alias("cstx"), y3.alias("csty"),
               "z1", "z2", "z3",
               _clx(F.least(x1, x2, x3)).alias("tx0"),
               _cly(F.greatest(y1, y2, y3)).alias("ty0"),
               _clx(F.greatest(x1, x2, x3)).alias("tx1"),
               _cly(F.least(y1, y2, y3)).alias("ty1")))
    near = F.broadcast(p.select(F.col("_pid").alias(id_col),
                                F.col("_x").alias("x"),
                                F.col("_y").alias("y"),
                                F.col("_v").alias("v")))
    return _facet_grid(spark, tdf, grid, zoom, fallback, near, id_col)

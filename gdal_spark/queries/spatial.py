"""Spatial operator battery: cell encode, Hilbert keys, PIP join,
covering cells, exact kNN — each with a bit-exact DuckDB oracle.

Points derive deterministically from ``documents.doc_id`` (see
_derive) so the driver's testdata doubles as a geo corpus; the
polygon side is the deterministic poly.shp-role fixture
(gdal_spark.sources.fixtures), embedded into the oracle SQL as
VALUES.  ~9% of derived points fall outside the polygon bbox —
the negative cases of the reference's two-phase filter
(ogrlayer.cpp:2253-2325).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from . import register, t
from . import _derive as dv
from .. import functions as gf
from ..operators.knn import knn_join
from ..operators.spatial_join import spatial_join
from ..sources import fixtures as fx

Z = dv.CELL_ZOOM        # fine cell id (per-doc addressing)
Z_JOIN = 6              # coarse join zoom: polygon bbox -> O(10-100) cells
Z_COVER = 9             # covering-cell demo zoom


def _points(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id")
    x, y = dv.point_cols(F.col("doc_id"))
    return docs.withColumn("x", x).withColumn("y", y)


# --------------------------------------------------------------- cell encode
_tx_sql, _ty_sql = dv.tile_sql(Z, "x", "y")

@register(
    "cell_encode",
    sql=f"""
    WITH pts AS ({dv.points_sql()})
    SELECT doc_id, {_tx_sql} AS tx, {_ty_sql} AS ty,
           {dv.pack_sql(Z, _tx_sql, _ty_sql)} AS cell
    FROM pts
    ORDER BY doc_id
    """,
    desc="H3/S2-role cell encoding on the TileMatrix quadtree "
         "(tilematrixset.hpp:75-88) — pure Column math, bit-matched in SQL",
)
def cell_encode(spark, sf_dir):
    pts = _points(spark, sf_dir)
    tx, ty = gf.tile_xy_cols(dv.GRID, Z, F.col("x"), F.col("y"))
    return (
        pts.withColumn("tx", tx)
        .withColumn("ty", ty)
        .withColumn("cell", gf.pack_cell_col(Z, F.col("tx"), F.col("ty")))
        .select("doc_id", "tx", "ty", "cell")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- hilbert key
@register(
    "hilbert_key",
    sql=f"""
    WITH pts AS ({dv.points_sql()}),
    g AS (
      SELECT doc_id,
             GREATEST(0, LEAST(65535, CAST(FLOOR((65535.0 * (x - {dv.MINX!r})) / {dv.W!r}) AS BIGINT))) AS hx,
             GREATEST(0, LEAST(65535, CAST(FLOOR((65535.0 * (y - {dv.MINY!r})) / {dv.H!r}) AS BIGINT))) AS hy
      FROM pts
    ),
    {dv.hilbert_sql_cte("g")}
    SELECT g.doc_id, g.hx, g.hy, hfin.hkey
    FROM g JOIN hfin ON hfin.doc_id = g.doc_id
    ORDER BY g.doc_id
    """,
    desc="32-bit Hilbert key (packedrtree.cpp:74-161) — the engine's "
         "range-partitioning order, bit-matched against a DuckDB CTE chain",
)
def hilbert_key(spark, sf_dir):
    pts = _points(spark, sf_dir)
    def g(v, mn, ext):
        raw = F.floor((F.lit(65535.0) * (v - F.lit(mn))) / F.lit(ext))
        return F.greatest(F.lit(0), F.least(F.lit(65535), raw)).cast("long")
    pts = pts.withColumn("hx", g(F.col("x"), dv.MINX, dv.W)).withColumn(
        "hy", g(F.col("y"), dv.MINY, dv.H))
    return (
        pts.withColumn("hkey", gf.hilbert_u32_pandas(F.col("hx"), F.col("hy")))
        .select("doc_id", "hx", "hy", "hkey")
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------ PIP join
@register(
    "pip_join",
    sql=f"""
    WITH pts AS ({dv.points_sql()}),
    edges(fid, ex1, ey1, ex2, ey2) AS (VALUES
      {dv.polygon_edges_values()}
    ),
    env(fid, exmin, eymin, exmax, eymax) AS (VALUES
      {dv.polygon_env_values()}
    ),
    attr(fid, eas_id, prfedea) AS (VALUES
      {dv.polygon_attr_values()}
    ),
    cand AS (
      SELECT p.doc_id, p.x, p.y, v.fid
      FROM pts p JOIN env v
        ON p.x >= v.exmin AND p.x <= v.exmax
       AND p.y >= v.eymin AND p.y <= v.eymax
    ),
    crossings AS (
      SELECT c.doc_id, c.fid,
        CASE WHEN (((e.ey1 - c.y) > 0 AND (e.ey2 - c.y) <= 0)
                OR ((e.ey2 - c.y) > 0 AND (e.ey1 - c.y) <= 0))
              AND (((e.ex1 - c.x) * (e.ey2 - c.y) - (e.ex2 - c.x) * (e.ey1 - c.y))
                   / ((e.ey2 - c.y) - (e.ey1 - c.y)) > 0)
        THEN 1 ELSE 0 END AS cr
      FROM cand c JOIN edges e ON e.fid = c.fid
    ),
    inside AS (
      SELECT doc_id, fid FROM crossings
      GROUP BY doc_id, fid HAVING SUM(cr) % 2 = 1
    )
    SELECT i.doc_id, i.fid, a.eas_id
    FROM inside i JOIN attr a ON a.fid = i.fid
    ORDER BY i.doc_id, i.fid
    """,
    desc="two-phase cell-indexed spatial join; exact phase bit-matches "
         "OGRLinearRing::isPointInRing (ogrlinearring.cpp:462-532) in both engines",
)
def pip_join(spark, sf_dir):
    pts = _points(spark, sf_dir)
    polys = spark.createDataFrame(fx.polygons_pandas())
    out = spatial_join(pts, polys, dv.GRID, zoom=Z_JOIN, how="inner")
    return out.select("doc_id", "fid", "eas_id").orderBy("doc_id", "fid")


# ------------------------------------------------------------ covering cells
_bx0, _by1 = dv.tile_sql(Z_COVER, "xmin", "ymin")
_bx1, _by0 = dv.tile_sql(Z_COVER, "xmax", "ymax")

@register(
    "polygon_cover",
    sql=f"""
    WITH b(fid, xmin, ymin, xmax, ymax) AS (VALUES
      {dv.polygon_bbox_values()}
    ),
    tr AS (
      SELECT fid, {_bx0} AS tx0, {_by0} AS ty0, {_bx1} AS tx1, {_by1} AS ty1
      FROM b
    )
    SELECT fid,
           (tx1 - tx0 + 1) * (ty1 - ty0 + 1)       AS n_cells,
           {dv.pack_sql(Z_COVER, "tx0", "ty0")}    AS min_cell,
           {dv.pack_sql(Z_COVER, "tx1", "ty1")}    AS max_cell
    FROM tr
    ORDER BY fid
    """,
    desc="polygon -> covering cell set (GetTileIndices, "
         "gdalalg_raster_tile.cpp:336); explode stays JVM-side via sequence()",
)
def polygon_cover(spark, sf_dir):
    polys = spark.createDataFrame(fx.polygons_pandas())
    cells = polys.withColumn(
        "cell",
        F.explode(gf.covering_cells_col(
            dv.GRID, Z_COVER, F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))),
    )
    return (
        cells.groupBy("fid")
        .agg(
            F.count("*").alias("n_cells"),
            F.min("cell").alias("min_cell"),
            F.max("cell").alias("max_cell"),
        )
        .orderBy("fid")
    )


# ----------------------------------------------------------------- exact kNN
KNN_K = 5
KNN_ZOOM = 4
KNN_QMOD = 53

@register(
    "knn",
    sql=f"""
    WITH pts AS ({dv.points_sql()}),
    qry AS (SELECT doc_id AS qid, x AS qx, y AS qy FROM pts WHERE doc_id % {KNN_QMOD} = 0),
    d AS (
      SELECT q.qid, p.doc_id AS pid,
             ((p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy)) AS dist2
      FROM qry q CROSS JOIN pts p
    ),
    r AS (
      SELECT qid, pid, dist2,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, pid) AS rnk
      FROM d
    )
    SELECT qid, rnk, pid, dist2 FROM r WHERE rnk <= {KNN_K}
    ORDER BY qid, rnk
    """,
    desc="exact kNN via cell-disk ring expansion (radius-growth of "
         "alg/gdalgrid.cpp:909-920) vs brute-force oracle; (dist2, pid) ties",
)
def knn(spark, sf_dir):
    pts = _points(spark, sf_dir).select(
        F.col("doc_id").alias("pid"), "x", "y")
    qry = _points(spark, sf_dir).filter(F.col("doc_id") % KNN_QMOD == 0).select(
        F.col("doc_id").alias("qid"), F.col("x").alias("qx"), F.col("y").alias("qy"))
    out = knn_join(pts, qry, dv.GRID, k=KNN_K, zoom=KNN_ZOOM, r0=2)
    return (
        out.select("qid", F.col("rank").cast("long").alias("rnk"),
                   "pid", "dist2")
        .orderBy("qid", "rnk")
    )


# ------------------------------------------------------ linear referencing
_LINES_SQL = f"""
    pts AS (
      SELECT doc_id, doc_id % 16 AS line_id,
             {dv.MINX!r} + {dv.W!r} * (CAST((doc_id * {dv.XMUL}) % {dv.PMOD}
               AS DOUBLE) / {dv.PDIV!r}) AS x,
             {dv.MINY!r} + {dv.H!r} * (CAST((doc_id * {dv.YMUL} + {dv.YADD})
               % {dv.PMOD} AS DOUBLE) / {dv.PDIV!r}) AS y
      FROM documents
    ),
    seg AS (
      SELECT line_id,
             ROW_NUMBER() OVER (PARTITION BY line_id ORDER BY doc_id) - 1
               AS si,
             x AS ax, y AS ay,
             LEAD(x) OVER (PARTITION BY line_id ORDER BY doc_id) AS bx,
             LEAD(y) OVER (PARTITION BY line_id ORDER BY doc_id) AS by
      FROM pts QUALIFY bx IS NOT NULL
    ),
    segl AS (
      -- arc length quantized to 2^20 units/m BEFORE accumulation:
      -- integer prefix sums are order-independent, so the windowed
      -- SUM below (a reassociating segment tree in DuckDB) agrees
      -- bit-for-bit with Spark's sequential running sum
      SELECT *, CAST(FLOOR(sqrt((bx - ax) * (bx - ax)
                 + (by - ay) * (by - ay)) * 1048576.0 + 0.5) AS BIGINT)
               AS seglen
      FROM seg
    ),
    segc AS (
      SELECT *,
             COALESCE(SUM(seglen) OVER (PARTITION BY line_id ORDER BY si
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             SUM(seglen) OVER (PARTITION BY line_id) AS total
      FROM segl
    )
"""


def _lines_df(spark, sf_dir):
    pts = _points(spark, sf_dir).withColumn(
        "line_id", F.col("doc_id") % 16)
    return (pts.groupBy("line_id")
            .agg(F.array_sort(F.collect_list(
                F.struct("doc_id", "x", "y"))).alias("_v"))
            .select(
                "line_id",
                F.expr("transform(_v, s -> s.x)").alias("xs"),
                F.expr("transform(_v, s -> s.y)").alias("ys")))


@register(
    "lineref_interpolate",
    sql=f"""
    WITH {_LINES_SQL},
    tgt AS (SELECT *, 0.35 * total AS target FROM segc),
    cand AS (
      SELECT line_id, si, ax, ay, bx, by, seglen, cum_before, target
      FROM tgt
      WHERE cum_before <= target AND target <= cum_before + seglen
      QUALIFY ROW_NUMBER() OVER (PARTITION BY line_id ORDER BY si) = 1
    )
    SELECT line_id,
           ROUND(ax + (CASE WHEN seglen > 0
                       THEN (target - cum_before) / seglen ELSE 0.0 END)
                 * (bx - ax), 6) AS x,
           ROUND(ay + (CASE WHEN seglen > 0
                       THEN (target - cum_before) / seglen ELSE 0.0 END)
                 * (by - ay), 6) AS y
    FROM cand ORDER BY line_id
    """,
    desc="linear referencing: point at 35% of each polyline's length "
         "(ogrlineref -create milepost rule / ST_Line_Interpolate_Point) "
         "— exploded segments + window cumsum, whole-stage-codegen "
         "Column math, one shuffle on line_id",
)
def lineref_interpolate(spark, sf_dir):
    from ..operators.lineref import interpolate_along

    out = interpolate_along(_lines_df(spark, sf_dir), 0.35)
    return out.select("line_id", F.round("x", 6).alias("x"),
                      F.round("y", 6).alias("y")).orderBy("line_id")


@register(
    "lineref_locate",
    sql=f"""
    WITH {_LINES_SQL},
    probe AS (
      SELECT g.i AS line_id, g.i AS pid,
             {dv.MINX!r} + {dv.W!r} * (CAST(((100000 + g.i) * {dv.XMUL})
               % {dv.PMOD} AS DOUBLE) / {dv.PDIV!r}) AS px,
             {dv.MINY!r} + {dv.H!r} * (CAST(((100000 + g.i) * {dv.YMUL}
               + {dv.YADD}) % {dv.PMOD} AS DOUBLE) / {dv.PDIV!r}) AS py
      FROM generate_series(0, 15) g(i)
    ),
    scored AS (
      SELECT s.line_id, p.pid, s.si, s.seglen, s.cum_before, s.total,
             CASE WHEN s.seglen > 0
                  THEN LEAST(GREATEST(((p.px - s.ax) * (s.bx - s.ax)
                       + (p.py - s.ay) * (s.by - s.ay))
                       / ((s.bx - s.ax) * (s.bx - s.ax)
                          + (s.by - s.ay) * (s.by - s.ay)), 0.0), 1.0)
                  ELSE 0.0 END AS t,
             p.px, p.py, s.ax, s.ay, s.bx, s.by
      FROM segc s JOIN probe p ON p.line_id = s.line_id
    ),
    best AS (
      SELECT *,
             (px - (ax + t * (bx - ax))) * (px - (ax + t * (bx - ax)))
             + (py - (ay + t * (by - ay))) * (py - (ay + t * (by - ay)))
               AS d2
      FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY line_id, pid
                                 ORDER BY d2 ASC, si ASC) = 1
    )
    SELECT line_id, pid,
           ROUND((cum_before + t * seglen) / total, 6) AS frac
    FROM best ORDER BY line_id
    """,
    desc="linear referencing: fraction of a probe point's projection "
         "along its line (ogrlineref -get_pos / ST_Line_Locate_Point) — "
         "clamped per-segment projection, argmin (d2, si), JVM-only",
)
def lineref_locate(spark, sf_dir):
    from ..operators.lineref import locate_point

    spark_probe = spark.range(16).select(
        F.col("id").alias("line_id"), F.col("id").alias("pid"))
    x, y = dv.point_cols(F.col("pid") + 100000)
    probe = spark_probe.withColumn("px", x).withColumn("py", y)
    out = locate_point(_lines_df(spark, sf_dir), probe)
    return out.select("line_id", "pid",
                      F.round("frac", 6).alias("frac")).orderBy("line_id")


@register(
    "line_substring",
    sql=f"""
    WITH {_LINES_SQL},
    lim AS (
      SELECT *, 0.2 * total AS t0, 0.7 * total AS t1 FROM segc
    ),
    s0 AS (
      SELECT line_id, MIN(si) AS s0 FROM lim
      WHERE seglen > 0 AND cum_before <= t0 AND t0 <= cum_before + seglen
      GROUP BY line_id
    ),
    s1 AS (
      SELECT line_id, MIN(si) AS s1 FROM lim
      WHERE seglen > 0 AND cum_before <= t1 AND t1 <= cum_before + seglen
      GROUP BY line_id
    ),
    marked AS (
      SELECT l.*, s0.s0, s1.s1 FROM lim l
      JOIN s0 USING (line_id) JOIN s1 USING (line_id)
    ),
    verts AS (
      SELECT line_id, 0 AS ord, 0 AS sub,
             ax * (1 - (t0 - cum_before) / seglen)
               + bx * ((t0 - cum_before) / seglen) AS x,
             ay * (1 - (t0 - cum_before) / seglen)
               + by * ((t0 - cum_before) / seglen) AS y
      FROM marked WHERE si = s0
      UNION ALL
      SELECT line_id, si + 1 AS ord, 0 AS sub, ax AS x, ay AS y
      FROM marked WHERE si > s0 AND si <= s1
      UNION ALL
      SELECT line_id, si + 2 AS ord, 1 AS sub,
             ax * (1 - (t1 - cum_before) / seglen)
               + bx * ((t1 - cum_before) / seglen) AS x,
             ay * (1 - (t1 - cum_before) / seglen)
               + by * ((t1 - cum_before) / seglen) AS y
      FROM marked WHERE si = s1
    )
    SELECT line_id,
           ROW_NUMBER() OVER (PARTITION BY line_id ORDER BY ord, sub) - 1
             AS vi,
           CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT) AS x_u,
           CAST(FLOOR(y * 1000000.0 + 0.5) AS BIGINT) AS y_u
    FROM verts ORDER BY line_id, vi
    """,
    desc="getSubLine between 20% and 70% of each polyline "
         "(ogrlinestring.cpp:2250-2439, ogrlineref -create part "
         "extraction): first-bracketing-segment interpolation + "
         "interior vertices, three unioned vertex classes, one "
         "cumsum shuffle",
)
def line_substring_q(spark, sf_dir):
    from ..operators.lineref import line_substring

    out = line_substring(_lines_df(spark, sf_dir), 0.2, 0.7)
    return out.select(
        "line_id", F.col("vi").cast("long").alias("vi"),
        # micro-int coordinates, NOT round(x, 6): interpolated UTM
        # coordinates land on exact decimal halves at sf1 volume,
        # where Spark HALF_UP and DuckDB binary rounding split by one
        # micro; floor(x*1e6 + 0.5) is the same IEEE expression in
        # both engines (sf1 oracle-sweep find)
        F.floor(F.col("x") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long").alias("x_u"),
        F.floor(F.col("y") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long").alias("y_u")).orderBy("line_id", "vi")


@register(
    "segmentize",
    sql=f"""
    WITH {_LINES_SQL},
    ends AS (
      SELECT line_id,
             FIRST_VALUE(x) OVER w AS x0, FIRST_VALUE(y) OVER w AS y0,
             LAST_VALUE(x) OVER w AS xn, LAST_VALUE(y) OVER w AS yn,
             doc_id, x, y
      FROM pts
      WINDOW w AS (PARTITION BY line_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING)
    ),
    flagged AS (
      SELECT *, (x0 < xn OR (x0 = xn AND y0 < yn)) AS rev FROM ends
    ),
    ordered AS (
      SELECT line_id, rev, x, y,
             ROW_NUMBER() OVER (PARTITION BY line_id
               ORDER BY CASE WHEN rev THEN -doc_id ELSE doc_id END) - 1
               AS si
      FROM flagged
    ),
    nseg AS (
      SELECT line_id, rev, si, x AS ax, y AS ay,
             LEAD(x) OVER (PARTITION BY line_id ORDER BY si) AS bx,
             LEAD(y) OVER (PARTITION BY line_id ORDER BY si) AS by
      FROM ordered QUALIFY bx IS NOT NULL
    ),
    segn AS (
      SELECT *,
             (bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS d2,
             CASE WHEN (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
                       - 160000.0 > 1e-5 * 160000.0
                  THEN CAST(FLOOR(SQRT(((bx - ax) * (bx - ax)
                       + (by - ay) * (by - ay)) / 160000.0) - 1e-2) AS INT)
                  ELSE 0 END AS n
      FROM nseg
    ),
    expanded AS (
      SELECT line_id, rev, si, j.j AS j,
             ax + j.j * ((bx - ax) / (CAST(n AS DOUBLE) + 1.0)) AS x,
             ay + j.j * ((by - ay) / (CAST(n AS DOUBLE) + 1.0)) AS y
      FROM segn, LATERAL (SELECT unnest(generate_series(0, n)) AS j) j
      UNION ALL
      SELECT line_id, rev, 2000000000 AS si, 0 AS j,
             CASE WHEN rev THEN x0 ELSE xn END AS x,
             CASE WHEN rev THEN y0 ELSE yn END AS y
      FROM (SELECT DISTINCT line_id, rev, x0, y0, xn, yn FROM flagged)
    ),
    idxd AS (
      SELECT line_id, rev, x, y,
             ROW_NUMBER() OVER (PARTITION BY line_id ORDER BY si, j) - 1
               AS fwd,
             COUNT(*) OVER (PARTITION BY line_id) AS cnt
      FROM expanded
    )
    SELECT line_id,
           CAST(CASE WHEN rev THEN cnt - 1 - fwd ELSE fwd END AS INT) AS vi,
           CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT) AS x_u,
           CAST(FLOOR(y * 1000000.0 + 0.5) AS BIGINT) AS y_u
    FROM idxd ORDER BY line_id, vi
    """,
    desc="OGRSimpleCurve::segmentize maxlen=400 "
         "(ogrlinestring.cpp:2661-2810): direction normalization, "
         "REL_EPSILON split rule, ratio-divided-once intermediates — "
         "sequence explode, zero Python",
)
def segmentize_q(spark, sf_dir):
    from ..operators.lineref import segmentize

    out = segmentize(_lines_df(spark, sf_dir), 400.0)
    # micro-int coordinates (same rationale as line_substring)
    return out.select(
        "line_id", F.col("vi").cast("int").alias("vi"),
        F.floor(F.col("x") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long").alias("x_u"),
        F.floor(F.col("y") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long").alias("y_u")).orderBy("line_id", "vi")


# --------------------------------------------------------------- S2 cells
_S2_PX = ("-1.0 + 2.0 * (CAST((doc_id * 2654435761) % 1000003"
          " AS DOUBLE) / 1000003.0)")
_S2_PY = ("-1.0 + 2.0 * (CAST((doc_id * 40503 + 12345) % 1000003"
          " AS DOUBLE) / 1000003.0)")
_S2_PZ = ("-1.0 + 2.0 * (CAST((doc_id * 69069 + 54321) % 1000003"
          " AS DOUBLE) / 1000003.0)")

_S2_SQL = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, {_S2_PX} AS px, {_S2_PY} AS py, {_S2_PZ} AS pz
  FROM documents
),
fc AS (
  SELECT doc_id, px, py, pz,
    CASE WHEN abs(px) > abs(py)
         THEN (CASE WHEN abs(px) > abs(pz) THEN 0 ELSE 2 END)
         ELSE (CASE WHEN abs(py) > abs(pz) THEN 1 ELSE 2 END) END AS axis
  FROM base
),
fc2 AS (
  SELECT doc_id, px, py, pz,
    axis + CASE WHEN (CASE axis WHEN 0 THEN px WHEN 1 THEN py ELSE pz END)
                     < 0.0 THEN 3 ELSE 0 END AS face
  FROM fc
),
uv AS (
  SELECT doc_id, face,
    CASE face WHEN 0 THEN py/px WHEN 1 THEN -px/py WHEN 2 THEN -px/pz
              WHEN 3 THEN pz/px WHEN 4 THEN pz/py ELSE -py/pz END AS u,
    CASE face WHEN 0 THEN pz/px WHEN 1 THEN pz/py WHEN 2 THEN -py/pz
              WHEN 3 THEN py/px WHEN 4 THEN -px/py ELSE -px/pz END AS v
  FROM fc2
),
st AS (
  SELECT doc_id, face,
    CASE WHEN u >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * u)
         ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s,
    CASE WHEN v >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * v)
         ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t
  FROM uv
),
ij AS (
  SELECT doc_id, face,
    LEAST(GREATEST(CAST(floor(s * 1073741824.0) AS BIGINT), 0),
          1073741823) AS i,
    LEAST(GREATEST(CAST(floor(t * 1073741824.0) AS BIGINT), 0),
          1073741823) AS j
  FROM st
),
h AS (
  SELECT doc_id, face, i, j, 29 AS k,
         CAST(face % 2 AS BIGINT) AS orient, CAST(0 AS BIGINT) AS pos
  FROM ij
  UNION ALL
  SELECT doc_id, face, i, j, k - 1,
         xor(orient, CASE pb WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END),
         pos * 4 + pb
  FROM (
    SELECT *,
      CASE orient * 4 + (((i >> k) & 1) * 2 + ((j >> k) & 1))
        WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 2
        WHEN 4 THEN 0 WHEN 5 THEN 3 WHEN 6 THEN 1 WHEN 7 THEN 2
        WHEN 8 THEN 2 WHEN 9 THEN 3 WHEN 10 THEN 1 WHEN 11 THEN 0
        ELSE CASE orient * 4 + (((i >> k) & 1) * 2 + ((j >> k) & 1))
          WHEN 12 THEN 2 WHEN 13 THEN 1 WHEN 14 THEN 3 ELSE 0 END
      END AS pb
    FROM h WHERE k >= 0
  )
)
SELECT doc_id, CAST(face AS INT) AS face, pos,
       printf('%d%015x', face, pos) AS token
FROM h WHERE k = -1 ORDER BY doc_id
"""


@register(
    "s2_encode",
    sql=_S2_SQL,
    desc="S2 cell-id encoding (north-star 'vectorized H3/S2 cell "
         "encoding' op; public S2 spec): cube-face selection, quadratic "
         "UV->ST, level-30 Hilbert state machine — Arrow pandas UDF with "
         "a 30-pass numpy kernel (kernels/s2.py); oracle RE-DERIVES the "
         "whole state machine independently as a recursive SQL CTE",
)
def s2_encode_q(spark, sf_dir):
    from . import t as _t
    from .. import functions as gf

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    base = (docs.withColumn("px", F.expr(_S2_PX))
                .withColumn("py", F.expr(_S2_PY))
                .withColumn("pz", F.expr(_S2_PZ)))
    cell = base.withColumn("c", gf.s2_cell_pandas(
        F.col("px"), F.col("py"), F.col("pz"), level=30))
    return cell.select(
        "doc_id", F.col("c.face").alias("face"), F.col("c.pos").alias("pos"),
        F.format_string("%d%015x", F.col("c.face"), F.col("c.pos"))
         .alias("token"),
    ).orderBy("doc_id")


# ------------------------------------------------------------- hex binning
_HX_X = ("-5000.0 + 10000.0 * (CAST((doc_id * 2654435761) % 1000003"
         " AS DOUBLE) / 1000003.0)")
_HX_Y = ("-5000.0 + 10000.0 * (CAST((doc_id * 40503 + 12345) % 1000003"
         " AS DOUBLE) / 1000003.0)")


def _hexbin_oracle():
    from ..operators.hexbin import hexbin_sql

    return hexbin_sql(
        f"SELECT doc_id, {_HX_X} AS hx, {_HX_Y} AS hy FROM documents",
        "hx", "hy", 150.0,
        "SELECT hexq, hexr, ROUND(hexx, 6) AS hexx, ROUND(hexy, 6) AS hexy,"
        " COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_id"
        " FROM {last} GROUP BY hexq, hexr, hexx, hexy"
        " ORDER BY hexq, hexr")


@register(
    "hexbin_agg",
    sql=_hexbin_oracle,
    desc="H3-style hexagonal binning (planar axial/cube-round lattice, "
         "documented planar analogue of geodesic H3): bin-and-aggregate "
         "as pure shared-expression-text Column math — same step strings "
         "drive the Spark plan and the DuckDB CTE oracle",
)
def hexbin_agg_q(spark, sf_dir):
    from . import t as _t
    from ..operators.hexbin import with_hex_cell

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    base = (docs.withColumn("hx", F.expr(_HX_X))
                .withColumn("hy", F.expr(_HX_Y)))
    cells = with_hex_cell(base, "hx", "hy", 150.0)
    return (cells.groupBy("hexq", "hexr", "hexx", "hexy")
            .agg(F.count("*").alias("n"), F.sum("doc_id").alias("sum_id"))
            .select("hexq", "hexr",
                    F.round("hexx", 6).alias("hexx"),
                    F.round("hexy", 6).alias("hexy"), "n", "sum_id")
            .orderBy("hexq", "hexr"))


# ------------------------------------------------------- S2-keyed PIP join
def _scaled_fixture(spark, sf_dir):
    """The pip_join fixture affine-mapped into lon/lat degrees (the
    S2 join's native CRS).  Containment is affine-invariant, so the
    ORACLE is the same independent planar SQL ray-cast as pip_join —
    it knows nothing about S2 or the scaling."""
    import numpy as np

    from ..kernels import wkb as kwkb

    minx, miny, maxx, maxy = fx.POLY_BBOX
    cx, cy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    s = 2.0 / (maxx - minx)

    pdf = fx.polygons_pandas()
    rows = []
    for _, r in pdf.iterrows():
        rings = [np.asarray(ring, dtype=np.float64).copy()
                 for ring in kwkb.polygon_rings(bytes(r["wkb"]))]
        for ring in rings:
            ring[:, 0] = (ring[:, 0] - cx) * s
            ring[:, 1] = (ring[:, 1] - cy) * s
        d = dict(r)
        d["wkb"] = kwkb.wkb_polygon(rings)
        d["xmin"] = (r["xmin"] - cx) * s
        d["xmax"] = (r["xmax"] - cx) * s
        d["ymin"] = (r["ymin"] - cy) * s
        d["ymax"] = (r["ymax"] - cy) * s
        rows.append(d)
    import pandas as pd
    polys = spark.createDataFrame(pd.DataFrame(rows))

    pts = _points(spark, sf_dir).select(
        "doc_id",
        ((F.col("x") - cx) * s).alias("x"),
        ((F.col("y") - cy) * s).alias("y"))
    return pts, polys


@register(
    "pip_join_s2",
    sql=None,   # assigned below: byte-identical to pip_join's oracle
    desc="S2-keyed two-phase spatial join (north-star H3/S2 path): "
         "points keyed by level-8 S2 cells (Arrow kernel), polygons by "
         "the dilated bbox coverer, SAME envelope + JVM ray-cast exact "
         "phase as the quadtree join; oracle = pip_join's independent "
         "planar SQL ray-cast (affine-invariant containment), so the "
         "two join paths are proven to agree",
)
def pip_join_s2_q(spark, sf_dir):
    from ..operators.spatial_join import spatial_join_s2

    pts, polys = _scaled_fixture(spark, sf_dir)
    out = spatial_join_s2(pts, polys, level=8, broadcast=True)
    return out.select("doc_id", "fid", "eas_id").orderBy("doc_id", "fid")


from . import QUERIES as _Q  # noqa: E402
_Q["pip_join_s2"].sql = _Q["pip_join"].sql


@register(
    "dialect_spatial_join",
    sql=None,   # assigned below: byte-identical to pip_join's oracle
    desc="ST_Intersects auto-rewrite (SURVEY §4.3 rule, sql/"
         "spatial_rewrite.py): the dialect statement JOIN ... ON "
         "ST_Intersects(p.geom, g.wkb) re-plans as the salted "
         "two-phase cell join instead of Catalyst's CartesianProduct "
         "+ per-pair UDF; oracle = pip_join's independent planar SQL "
         "ray-cast, so the rewritten plan is value-exact with the "
         "brute-force semantics",
)
def dialect_spatial_join(spark, sf_dir):
    from ..kernels import wkb as kwkb
    from ..sql import ogr_sql

    @F.pandas_udf("binary")
    def _pt_wkb(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series([kwkb.wkb_point(a, b) for a, b in zip(x, y)])

    # the geometry column exists so the statement can name it; the
    # rewritten plan never evaluates it (column pruning drops the UDF
    # — the cell join keys on x/y directly)
    pts = _points(spark, sf_dir).withColumn("geom", _pt_wkb("x", "y"))
    pts.createOrReplaceTempView("dsj_pts")
    spark.createDataFrame(fx.polygons_pandas()) \
        .createOrReplaceTempView("dsj_polys")
    return ogr_sql(
        spark,
        "SELECT p.doc_id, g.fid, g.eas_id FROM dsj_pts p "
        "JOIN dsj_polys g ON ST_Intersects(p.geom, g.wkb) "
        "ORDER BY p.doc_id, g.fid")


_Q["dialect_spatial_join"].sql = _Q["pip_join"].sql


# --------------------------------------------------- arc linearization
from ..operators import curve as _cv  # noqa: E402
from ..operators.tmerc import steps_to_cte as _steps_to_cte  # noqa: E402

_ARC_PTS = [
    ("x0", "CAST((doc_id * 2654435761) % 1000 AS DOUBLE) / 10.0"),
    ("y0", "CAST((doc_id * 40503 + 7) % 1000 AS DOUBLE) / 10.0"),
    ("x1", "CAST((doc_id * 69069 + 13) % 1000 AS DOUBLE) / 10.0"),
    ("y1", "CAST((doc_id * 48271 + 29) % 1000 AS DOUBLE) / 10.0"),
    ("x2", "CAST((doc_id * 16807 + 31) % 1000 AS DOUBLE) / 10.0"),
    ("y2", "CAST((doc_id * 22695477 + 3) % 1000 AS DOUBLE) / 10.0"),
]

_ARC_STEP_RAD = 4.0 / 180.0 * 3.141592653589793

_ARC_FINAL = f"""
    SELECT arc_id,
           CAST(CASE WHEN swap THEN cnt - 1 - fwd ELSE fwd END AS INT) AS vi,
           ROUND(x, 4) AS x, ROUND(y, 4) AS y
    FROM (
      SELECT arc_id, swap, x, y,
             ROW_NUMBER() OVER (PARTITION BY arc_id ORDER BY ord, k) - 1
               AS fwd,
             COUNT(*) OVER (PARTITION BY arc_id) AS cnt
      FROM (
        SELECT arc_id, swap, 0 AS ord, 0 AS k, ax AS x, ay AS y FROM {{last}}
        UNION ALL
        SELECT arc_id, swap, 1 AS ord, kk.k AS k,
               {_cv.STROKE_X.format(a='al0', s='stepa')} AS x,
               {_cv.STROKE_Y.format(a='al0', s='stepa')} AS y
        FROM {{last}} p,
             LATERAL (SELECT unnest(generate_series(1, p.nsa - 1)) AS k) kk
        WHERE {_cv.STROKE_KEEP.format(a='al0', b='al1', s='stepa')}
        UNION ALL
        SELECT arc_id, swap, 2 AS ord, 0 AS k, x1 AS x, y1 AS y FROM {{last}}
        UNION ALL
        SELECT arc_id, swap, 3 AS ord, kk.k AS k,
               {_cv.STROKE_X.format(a='al1', s='stepb')} AS x,
               {_cv.STROKE_Y.format(a='al1', s='stepb')} AS y
        FROM {{last}} p,
             LATERAL (SELECT unnest(generate_series(1, p.nsb - 1)) AS k) kk
        WHERE {_cv.STROKE_KEEP.format(a='al1', b='al2', s='stepb')}
        UNION ALL
        SELECT arc_id, swap, 4 AS ord, 0 AS k, ex AS x, ey AS y FROM {{last}}
      ) v
    ) i
    ORDER BY arc_id, vi
"""


@register(
    "curve_to_line",
    sql=_steps_to_cte(
        "SELECT doc_id AS arc_id, "
        + ", ".join(f"{e} AS {n}" for n, e in _ARC_PTS)
        + " FROM documents",
        _cv.arc_param_steps(_ARC_STEP_RAD),
        _ARC_FINAL),
    desc="CircularString -> LineString linearization "
         "(ogrgeometryfactory.cpp:5440 curveToLineString, "
         "ADD_INTERMEDIATE_POINT mode; GetCurveParameters :5176, "
         "StrokeArc :5275, arc-order symmetry :5381): per-arc params in "
         "one Arrow numpy pass, vertices from JVM sequence-explodes; "
         "oracle restates the whole kernel as a DuckDB CTE chain "
         "(two independent implementations of the same C recurrences)",
)
def curve_to_line_q(spark, sf_dir):
    base = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("arc_id"),
        *[F.expr(e).alias(n) for n, e in _ARC_PTS])
    out = _cv.curve_to_line(base)
    return out.select(
        "arc_id", "vi", F.round("x", 4).alias("x"),
        F.round("y", 4).alias("y")).orderBy("arc_id", "vi")


# ------------------------------------------------- explodecollections
@register(
    "explode_collections",
    sql="""
    WITH mp AS (
      SELECT doc_id, j.p AS part, 1 AS gtype, 1 AS npts,
             CAST(doc_id % 100 + j.p AS DOUBLE) AS x0,
             CAST((doc_id * 3) % 100 - j.p AS DOUBLE) AS y0
      FROM documents,
           LATERAL (SELECT unnest(generate_series(0, doc_id % 4)) AS p) j
      WHERE doc_id % 3 = 0
    ),
    ml AS (
      SELECT doc_id, j.p AS part, 2 AS gtype, 3 AS npts,
             CAST(j.p * 10 + doc_id % 50 AS DOUBLE) AS x0,
             CAST(doc_id % 20 AS DOUBLE) AS y0
      FROM documents,
           LATERAL (SELECT unnest(generate_series(0, 1)) AS p) j
      WHERE doc_id % 3 = 1
    ),
    mpoly AS (
      SELECT doc_id, j.p AS part, 3 AS gtype, 4 AS npts,
             CAST(doc_id % 50 + 5 * j.p AS DOUBLE) AS x0,
             CAST(doc_id % 30 + 3 * j.p AS DOUBLE) AS y0
      FROM documents,
           LATERAL (SELECT unnest(generate_series(0, doc_id % 2)) AS p) j
      WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(part AS INT) AS part, CAST(gtype AS INT) AS gtype,
           CAST(npts AS INT) AS npts, x0, y0
    FROM (SELECT * FROM mp UNION ALL SELECT * FROM ml
          UNION ALL SELECT * FROM mpoly)
    ORDER BY doc_id, part
    """,
    desc="ogr2ogr -explodecollections (ogr2ogr_lib.cpp:6569-6610): one "
         "feature per Multi* part, attributes duplicated — single Arrow "
         "map stage, partitioning preserved; fixture Multi* WKB built "
         "from doc_id formulas, oracle re-derives parts relationally",
)
def explode_collections_q(spark, sf_dir):
    from ..operators import geometry as ge

    docs = t(spark, sf_dir, "documents").select("doc_id")
    multi = ge.synth_multi_col_rows(docs)
    out = ge.explode_collections(multi)
    return out.select("doc_id", "part", "gtype", "npts", "x0", "y0") \
        .orderBy("doc_id", "part")


@register(
    "explode_collections_z",
    sql="""
    SELECT doc_id, CAST(j.p AS INT) AS part,
           CAST(CASE j.p WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END AS INT)
             AS gtype,
           CAST(CASE j.p WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT)
             AS npts,
           CAST(CASE j.p WHEN 0 THEN doc_id % 100
                         WHEN 1 THEN doc_id % 50
                         ELSE doc_id % 40 END AS DOUBLE) AS x0,
           CAST(CASE j.p WHEN 0 THEN (doc_id * 3) % 100
                         WHEN 1 THEN doc_id % 20
                         ELSE doc_id % 30 END AS DOUBLE) AS y0,
           CAST(CASE j.p WHEN 0 THEN doc_id % 7
                         WHEN 1 THEN doc_id % 5
                         ELSE doc_id % 9 END AS DOUBLE) AS z0
    FROM documents, LATERAL (SELECT unnest(generate_series(0, 2)) AS p) j
    ORDER BY doc_id, part
    """,
    desc="explodecollections over GeometryCollection-Z WKB (type 1007, "
         "ISO +1000 Z offset — ogr_core.h:405-519): heterogeneous "
         "PointZ/LineStringZ/PolygonZ parts keep their tags AND their "
         "z ordinates through the parse->re-encode roundtrip; z0 is "
         "re-read from each PART's emitted WKB, proving the Z "
         "roundtrip, not just the parse",
)
def explode_collections_z_q(spark, sf_dir):
    from ..operators import geometry as ge
    from ..kernels import wkb as kwkb_

    docs = t(spark, sf_dir, "documents").select("doc_id")
    gc = ge.synth_gc_z_rows(docs)
    out = ge.explode_collections(gc)

    # prove the PART blobs carry Z: re-parse each emitted part WKB and
    # take z from its first vertex (not the z0 column the operator
    # already computed)
    import pandas as pd_

    def _z_back(it):
        for pdf in it:
            zs = []
            for blob in pdf["wkb"]:
                base, hz, hm, payload = kwkb_.parse_wkb_full(bytes(blob))
                assert hz, "part WKB lost its Z flag"
                v0 = (payload if base == kwkb_.POINT
                      else payload[0] if base == kwkb_.LINESTRING
                      else payload[0][0])
                zs.append(float(v0[2]))
            out_pdf = pdf[["doc_id", "part", "gtype", "npts", "x0", "y0"]]
            yield out_pdf.assign(z0=pd_.Series(zs, index=pdf.index))

    return out.mapInPandas(
        _z_back, "doc_id long, part int, gtype int, npts int, "
                 "x0 double, y0 double, z0 double").orderBy("doc_id", "part")


@register(
    "explode_collections_zm",
    sql="""
    SELECT doc_id, CAST(j.p AS INT) AS part,
           CAST(CASE j.p WHEN 0 THEN 1 WHEN 1 THEN 2
                         WHEN 2 THEN 8 ELSE 3 END AS INT) AS gtype,
           CAST(CASE j.p WHEN 0 THEN 1 WHEN 3 THEN 4 ELSE 3 END AS INT)
             AS npts,
           CAST(CASE j.p WHEN 0 THEN doc_id % 100
                         WHEN 1 THEN doc_id % 50
                         WHEN 2 THEN doc_id % 60
                         ELSE doc_id % 40 END AS DOUBLE) AS x0,
           CAST(CASE j.p WHEN 0 THEN (doc_id * 3) % 100
                         WHEN 1 THEN doc_id % 20
                         WHEN 2 THEN doc_id % 25
                         ELSE doc_id % 30 END AS DOUBLE) AS y0,
           CAST(CASE j.p WHEN 0 THEN doc_id % 7
                         WHEN 1 THEN doc_id % 5
                         WHEN 2 THEN doc_id % 6
                         ELSE doc_id % 9 END AS DOUBLE) AS z0,
           CAST(CASE j.p WHEN 0 THEN doc_id % 11
                         WHEN 1 THEN doc_id % 13
                         WHEN 2 THEN doc_id % 17
                         ELSE doc_id % 15 END AS DOUBLE) AS m0
    FROM documents, LATERAL (SELECT unnest(generate_series(0, 3)) AS p) j
    ORDER BY doc_id, part
    """,
    desc="explodecollections over GeometryCollection-ZM WKB (type 3007, "
         "ISO +3000 offset — ogr_core.h:491,512): PointZM/LineStringZM/"
         "CircularStringZM/PolygonZM parts keep tags AND both extra "
         "ordinates; z0/m0 are re-read from each emitted PART's WKB "
         "(4-wide vertices), proving the full ZM roundtrip including a "
         "curved member",
)
def explode_collections_zm_q(spark, sf_dir):
    from ..operators import geometry as ge
    from ..kernels import wkb as kwkb_

    docs = t(spark, sf_dir, "documents").select("doc_id")
    gc = ge.synth_gc_zm_rows(docs)
    out = ge.explode_collections(gc)

    import pandas as pd_

    def _zm_back(it):
        for pdf in it:
            zs, ms = [], []
            for blob in pdf["wkb"]:
                base, hz, hm, payload = kwkb_.parse_wkb_full(bytes(blob))
                assert hz and hm, "part WKB lost its Z/M flags"
                v0 = (payload if base == kwkb_.POINT
                      else payload[0] if base in (kwkb_.LINESTRING,
                                                  kwkb_.CIRCULARSTRING)
                      else payload[0][0])
                zs.append(float(v0[2]))
                ms.append(float(v0[3]))
            out_pdf = pdf[["doc_id", "part", "gtype", "npts", "x0", "y0"]]
            yield out_pdf.assign(z0=pd_.Series(zs, index=pdf.index),
                                 m0=pd_.Series(ms, index=pdf.index))

    return out.mapInPandas(
        _zm_back, "doc_id long, part int, gtype int, npts int, "
                  "x0 double, y0 double, z0 double, m0 double"
    ).orderBy("doc_id", "part")


# ---------------------------------------------- compound-curve stroke
_CC_AX0 = "CAST(doc_id % 90 AS DOUBLE)"
_CC_AY0 = "CAST((3 * doc_id) % 80 AS DOUBLE)"

# per segment: (kind, [x0,y0,x1,y1,x2,y2] in terms of ax0/ay0/doc_id)
_CC_SEGS = [
    ("line", ["ax0", "ay0", "ax0 + 2 + doc_id % 3", "ay0 + 1 + doc_id % 4",
              "ax0 + 5", "ay0 + 3"]),
    ("arc",  ["ax0 + 5", "ay0 + 3", "ax0 + 8 + doc_id % 5",
              "ay0 + 7 + doc_id % 3", "ax0 + 11", "ay0 + 2"]),
    ("line", ["ax0 + 11", "ay0 + 2", "ax0 + 13", "ay0 + 2 - doc_id % 3",
              "ax0 + 15 + doc_id % 4", "ay0 - 1"]),
]


def _cc_expr(s: str) -> str:
    return s.replace("ax0", f"({_CC_AX0})").replace("ay0", f"({_CC_AY0})")


def _cc_oracle_sql() -> str:
    arc = [_cc_expr(s) for s in _CC_SEGS[1][1]]
    base = ("SELECT doc_id AS curve_id, "
            + ", ".join(f"{e} AS {n}" for n, e in
                        zip(["x0", "y0", "x1", "y1", "x2", "y2"], arc))
            + " FROM documents")
    line_parts = []
    for si in (0, 2):
        ex = [_cc_expr(s) for s in _CC_SEGS[si][1]]
        for vi in range(3):
            line_parts.append(
                f"SELECT doc_id AS curve_id, {si} AS seg, {vi} AS vi, "
                f"{ex[2 * vi]} AS x, {ex[2 * vi + 1]} AS y FROM documents")
    lines = " UNION ALL ".join(line_parts)
    final = f"""
    SELECT curve_id, CAST(gvi AS INT) AS vi,
           ROUND(x, 4) AS x, ROUND(y, 4) AS y
    FROM (
      SELECT curve_id, x, y,
             ROW_NUMBER() OVER (PARTITION BY curve_id ORDER BY seg, vi) - 1
               AS gvi
      FROM (
        SELECT * FROM (
          SELECT curve_id, 1 AS seg,
                 CASE WHEN swap THEN cnt - 1 - fwd ELSE fwd END AS vi, x, y
          FROM (
            SELECT curve_id, swap, x, y,
                   ROW_NUMBER() OVER (PARTITION BY curve_id
                                      ORDER BY ord, k) - 1 AS fwd,
                   COUNT(*) OVER (PARTITION BY curve_id) AS cnt
            FROM (
              SELECT curve_id, swap, 0 AS ord, 0 AS k, ax AS x, ay AS y
              FROM {{last}}
              UNION ALL
              SELECT curve_id, swap, 1 AS ord, kk.k AS k,
                     {_cv.STROKE_X.format(a='al0', s='stepa')} AS x,
                     {_cv.STROKE_Y.format(a='al0', s='stepa')} AS y
              FROM {{last}} p,
                   LATERAL (SELECT unnest(generate_series(1, p.nsa - 1))
                            AS k) kk
              WHERE {_cv.STROKE_KEEP.format(a='al0', b='al1', s='stepa')}
              UNION ALL
              SELECT curve_id, swap, 2 AS ord, 0 AS k, x1 AS x, y1 AS y
              FROM {{last}}
              UNION ALL
              SELECT curve_id, swap, 3 AS ord, kk.k AS k,
                     {_cv.STROKE_X.format(a='al1', s='stepb')} AS x,
                     {_cv.STROKE_Y.format(a='al1', s='stepb')} AS y
              FROM {{last}} p,
                   LATERAL (SELECT unnest(generate_series(1, p.nsb - 1))
                            AS k) kk
              WHERE {_cv.STROKE_KEEP.format(a='al1', b='al2', s='stepb')}
              UNION ALL
              SELECT curve_id, swap, 4 AS ord, 0 AS k, ex AS x, ey AS y
              FROM {{last}}
            ) v
          ) i
        )
        UNION ALL ({lines})
      ) allv
      WHERE seg = 0 OR vi > 0
    ) g
    ORDER BY curve_id, vi
    """
    return _steps_to_cte(base, _cv.arc_param_steps(_ARC_STEP_RAD), final)


@register(
    "compound_curve",
    sql=_cc_oracle_sql(),
    desc="CompoundCurve -> LineString (ogrcompoundcurve.cpp:309-325 "
         "CurveToLineInternal): line + arc + line segments linearized "
         "independently, concatenated skipping each non-first segment's "
         "start vertex (addSubLineString joint rule); arc stroke shares "
         "the curve_to_line kernel, oracle restates everything in SQL",
)
def compound_curve_q(spark, sf_dir):
    from ..operators import curve as cvo

    docs = t(spark, sf_dir, "documents").select("doc_id")
    segs = None
    for i, (kind, ex) in enumerate(_CC_SEGS):
        e = [_cc_expr(s) for s in ex]
        part = docs.select(
            F.col("doc_id").alias("curve_id"), F.lit(i).alias("seg"),
            F.lit(kind).alias("kind"),
            *[F.expr(txt).cast("double").alias(c)
              for c, txt in zip(["x0", "y0", "x1", "y1", "x2", "y2"], e)])
        segs = part if segs is None else segs.unionByName(part)
    out = cvo.compound_curve_to_line(segs)
    return out.select(
        "curve_id", "vi", F.round("x", 4).alias("x"),
        F.round("y", 4).alias("y")).orderBy("curve_id", "vi")


# ------------------------------------------------ curve polygon stroke
# Closed ring: seg2 ends exactly where seg0 begins.
_CP_SEGS = [
    ("line", ["ax0", "ay0", "ax0 + 2 + doc_id % 3", "ay0 + 1 + doc_id % 4",
              "ax0 + 5", "ay0 + 3"]),
    ("arc",  ["ax0 + 5", "ay0 + 3", "ax0 + 8 + doc_id % 5",
              "ay0 + 7 + doc_id % 3", "ax0 + 11", "ay0 + 2"]),
    ("line", ["ax0 + 11", "ay0 + 2", "ax0 + 5", "ay0 + 1", "ax0", "ay0"]),
]


def _cp_oracle_sql() -> str:
    arc = [_cc_expr(s) for s in _CP_SEGS[1][1]]
    base = ("SELECT doc_id AS curve_id, "
            + ", ".join(f"{e} AS {n}" for n, e in
                        zip(["x0", "y0", "x1", "y1", "x2", "y2"], arc))
            + " FROM documents")
    line_parts = []
    for si in (0, 2):
        ex = [_cc_expr(s) for s in _CP_SEGS[si][1]]
        for vi in range(3):
            line_parts.append(
                f"SELECT doc_id AS curve_id, {si} AS seg, {vi} AS vi, "
                f"{ex[2 * vi]} AS x, {ex[2 * vi + 1]} AS y FROM documents")
    lines = " UNION ALL ".join(line_parts)
    final = f"""
    SELECT curve_id AS poly_id, CAST(0 AS INT) AS ring, CAST(gvi AS INT)
             AS vi, ROUND(x, 4) AS x, ROUND(y, 4) AS y
    FROM (
      SELECT curve_id, x, y,
             ROW_NUMBER() OVER (PARTITION BY curve_id ORDER BY seg, vi) - 1
               AS gvi
      FROM (
        SELECT * FROM (
          SELECT curve_id, 1 AS seg,
                 CASE WHEN swap THEN cnt - 1 - fwd ELSE fwd END AS vi, x, y
          FROM (
            SELECT curve_id, swap, x, y,
                   ROW_NUMBER() OVER (PARTITION BY curve_id
                                      ORDER BY ord, k) - 1 AS fwd,
                   COUNT(*) OVER (PARTITION BY curve_id) AS cnt
            FROM (
              SELECT curve_id, swap, 0 AS ord, 0 AS k, ax AS x, ay AS y
              FROM {{last}}
              UNION ALL
              SELECT curve_id, swap, 1 AS ord, kk.k AS k,
                     {_cv.STROKE_X.format(a='al0', s='stepa')} AS x,
                     {_cv.STROKE_Y.format(a='al0', s='stepa')} AS y
              FROM {{last}} p,
                   LATERAL (SELECT unnest(generate_series(1, p.nsa - 1))
                            AS k) kk
              WHERE {_cv.STROKE_KEEP.format(a='al0', b='al1', s='stepa')}
              UNION ALL
              SELECT curve_id, swap, 2 AS ord, 0 AS k, x1 AS x, y1 AS y
              FROM {{last}}
              UNION ALL
              SELECT curve_id, swap, 3 AS ord, kk.k AS k,
                     {_cv.STROKE_X.format(a='al1', s='stepb')} AS x,
                     {_cv.STROKE_Y.format(a='al1', s='stepb')} AS y
              FROM {{last}} p,
                   LATERAL (SELECT unnest(generate_series(1, p.nsb - 1))
                            AS k) kk
              WHERE {_cv.STROKE_KEEP.format(a='al1', b='al2', s='stepb')}
              UNION ALL
              SELECT curve_id, swap, 4 AS ord, 0 AS k, ex AS x, ey AS y
              FROM {{last}}
            ) v
          ) i
        )
        UNION ALL ({lines})
      ) allv
      WHERE seg = 0 OR vi > 0
    ) g
    ORDER BY poly_id, vi
    """
    return _steps_to_cte(base, _cv.arc_param_steps(_ARC_STEP_RAD), final)


@register(
    "curve_polygon",
    sql=_cp_oracle_sql(),
    desc="CurvePolygon -> Polygon (ogrcurvepolygon.cpp:578-596 "
         "CurvePolyToPoly): each ring CurveToLine'd and re-attached; "
         "fixture ring is line+arc+line CLOSED (last segment ends at the "
         "first's start), closure verified by the stroked ring's first == "
         "last vertex; oracle restates the whole kernel in SQL",
)
def curve_polygon_q(spark, sf_dir):
    from ..operators import curve as cvo

    docs = t(spark, sf_dir, "documents").select("doc_id")
    segs = None
    for i, (kind, ex) in enumerate(_CP_SEGS):
        e = [_cc_expr(s) for s in ex]
        part = docs.select(
            F.col("doc_id").alias("poly_id"), F.lit(0).alias("ring"),
            F.lit(i).alias("seg"), F.lit(kind).alias("kind"),
            *[F.expr(txt).cast("double").alias(c)
              for c, txt in zip(["x0", "y0", "x1", "y1", "x2", "y2"], e)])
        segs = part if segs is None else segs.unionByName(part)
    out = cvo.curve_polygon_to_polygon(segs)
    return out.select(
        "poly_id", "ring", "vi", F.round("x", 4).alias("x"),
        F.round("y", 4).alias("y")).orderBy("poly_id", "vi")


# -------------------------------------------- vectorized ST_ measures
@register(
    "st_measures",
    sql="""
    WITH g AS (
      SELECT doc_id,
             doc_id % 100 AS x0, doc_id % 50 AS y0,
             1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 2000
    )
    SELECT doc_id,
           CAST(w * h AS DOUBLE) AS area,
           CAST(w + h AS DOUBLE) AS length,
           x0 + w / 2.0 AS cx,
           y0 + h / 2.0 AS cy
    FROM g ORDER BY doc_id
    """,
    desc="ST_Area / ST_Length / ST_Centroid over the batched measure "
         "kernels (kernels/batch_measures.py — one coordinate "
         "materialization per Arrow batch, reduceat ring sums; the "
         "uniform-layout batches here take the zero-per-row matrix "
         "fast path, 2.4M rows/s vs 0.07M per-row).  Rect/L-shaped "
         "fixtures from doc_id give closed-form integer oracles: "
         "area w*h, boundary-walk length w+h, centroid at the rect "
         "center — exact in IEEE for both engines",
)
def st_measures_q(spark, sf_dir):
    from ..functions.st import register_st_functions
    register_st_functions(spark)
    docs = t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 2000)
    g = docs.select(
        "doc_id",
        (F.col("doc_id") % 100).alias("x0"),
        (F.col("doc_id") % 50).alias("y0"),
        (1 + F.col("doc_id") % 7).alias("w"),
        (1 + F.col("doc_id") % 5).alias("h"),
    )
    g.createOrReplaceTempView("_stm")
    return spark.sql("""
        SELECT doc_id,
               st_area(st_geomfromtext(format_string(
                 'POLYGON((%d %d,%d %d,%d %d,%d %d,%d %d))',
                 x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h,
                 x0, y0))) AS area,
               st_length(st_geomfromtext(format_string(
                 'LINESTRING(%d %d,%d %d,%d %d)',
                 x0, y0, x0 + w, y0, x0 + w, y0 + h))) AS length,
               st_x(st_centroid(st_geomfromtext(format_string(
                 'POLYGON((%d %d,%d %d,%d %d,%d %d,%d %d))',
                 x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h,
                 x0, y0)))) AS cx,
               st_y(st_centroid(st_geomfromtext(format_string(
                 'POLYGON((%d %d,%d %d,%d %d,%d %d,%d %d))',
                 x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h,
                 x0, y0)))) AS cy
        FROM _stm ORDER BY doc_id
    """)

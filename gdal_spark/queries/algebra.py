"""Layer-algebra battery: Intersection/Clip/Erase/Identity/Union/
SymDifference of derived doc points x the fixture polygon layer,
each oracle-checked against the shared ray-cast match CTE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register, t
from . import _derive as dv
from .spatial import _points
from ..operators import layer_algebra as la
from ..sources import fixtures as fx
import numpy as np

Z = 6


def _polys(spark):
    return spark.createDataFrame(fx.polygons_pandas())


@register(
    "la_clip",
    sql=f"""
    WITH {dv.pip_match_cte()}
    SELECT p.doc_id, p.x, p.y FROM pts p
    WHERE p.doc_id IN (SELECT doc_id FROM inside)
    ORDER BY p.doc_id
    """,
    desc="Clip: input points cut to the polygon layer's area "
         "(ogrlayer.cpp:5497) — semi-join on the two-phase match set",
)
def la_clip(spark, sf_dir):
    out = la.clip(_points(spark, sf_dir), _polys(spark), dv.GRID, zoom=Z)
    return out.select("doc_id", "x", "y").orderBy("doc_id")


@register(
    "la_erase",
    sql=f"""
    WITH {dv.pip_match_cte()}
    SELECT p.doc_id, p.x, p.y FROM pts p
    WHERE p.doc_id NOT IN (SELECT doc_id FROM inside)
    ORDER BY p.doc_id
    """,
    desc="Erase: input minus the polygon area (ogrlayer.cpp:5806) — "
         "anti-join on the match set",
)
def la_erase(spark, sf_dir):
    out = la.erase(_points(spark, sf_dir), _polys(spark), dv.GRID, zoom=Z)
    return out.select("doc_id", "x", "y").orderBy("doc_id")


@register(
    "la_identity",
    sql=f"""
    WITH {dv.pip_match_cte()}
    SELECT p.doc_id, i.fid, a.eas_id
    FROM pts p
    LEFT JOIN inside i ON i.doc_id = p.doc_id
    LEFT JOIN attr a ON a.fid = i.fid
    ORDER BY p.doc_id, i.fid
    """,
    desc="Identity: input split by the method layer, unmatched rows "
         "keep NULL method attrs (ogrlayer.cpp:4730)",
)
def la_identity(spark, sf_dir):
    out = la.identity(_points(spark, sf_dir), _polys(spark), dv.GRID, zoom=Z)
    return out.select("doc_id", "fid", "eas_id").orderBy("doc_id", "fid")


@register(
    "la_union",
    sql=f"""
    WITH {dv.pip_match_cte()}
    SELECT p.doc_id, i.fid, a.eas_id
    FROM pts p
    LEFT JOIN inside i ON i.doc_id = p.doc_id
    LEFT JOIN attr a ON a.fid = i.fid
    UNION ALL
    SELECT NULL AS doc_id, q.fid, q.eas_id
    FROM attr q WHERE q.fid NOT IN (SELECT fid FROM inside)
    ORDER BY doc_id, fid
    """,
    desc="Union: Identity + method-only remainders (ogrlayer.cpp:3763)",
)
def la_union(spark, sf_dir):
    out = la.union(_points(spark, sf_dir), _polys(spark), dv.GRID, zoom=Z)
    return out.select("doc_id", "fid", "eas_id").orderBy("doc_id", "fid")


@register(
    "la_symdifference",
    sql=f"""
    WITH {dv.pip_match_cte()}
    SELECT p.doc_id, CAST(NULL AS BIGINT) AS fid FROM pts p
    WHERE p.doc_id NOT IN (SELECT doc_id FROM inside)
    UNION ALL
    SELECT NULL AS doc_id, q.fid
    FROM attr q WHERE q.fid NOT IN (SELECT fid FROM inside)
    ORDER BY doc_id, fid
    """,
    desc="SymDifference: A-only + B-only remainders (ogrlayer.cpp:4300)",
)
def la_symdifference(spark, sf_dir):
    out = la.sym_difference(
        _points(spark, sf_dir), _polys(spark), dv.GRID, zoom=Z)
    return out.select("doc_id", "fid").orderBy("doc_id", "fid")


# ================= polygon x polygon layer algebra ==================
# A = fixture polygons shifted (partial self-overlaps), B = fixture
# polygons, both in a local metre frame; pieces from the planar-
# overlay kernel (kernels/clip.py).  Oracle = the INDEPENDENT slab-
# decomposition re-derivation in _slab_oracle.py (pure SQL trapezoid
# integration, no shared code with the kernel) — it checks both the
# overlay semantics AND the distributed cell-join/cogroup assembly.
# Areas are compared per (afid, bfid) at 3 decimals; piece-level
# parity against the serial kernel stays in tests/test_layer_algebra.

def _poly_ab(spark):
    from ._goldens import _poly_layers
    a, b = _poly_layers()
    return spark.createDataFrame(a), spark.createDataFrame(b)


def _poly_out(df):
    """Aggregate overlay pieces per feature pair; keep NULL-area
    passthrough rows (Update's method features)."""
    out = (df.groupBy("afid", "bfid")
           .agg(F.round(F.sum("area"), 3).alias("area"))
           .filter((F.col("area") > 0) | F.col("area").isNull()))
    return out.orderBy(
        F.col("afid").asc_nulls_first(), F.col("bfid").asc_nulls_first(),
        "area")


def _mk_poly_query(op, la_fn, ref):
    def q(spark, sf_dir, _fn=la_fn):
        a, b = _poly_ab(spark)
        return _poly_out(_fn(a, b, dv.GRID, zoom=Z))

    register(
        f"la_poly_{op}",
        sql=lambda op=op: __import__(
            "gdal_spark.queries._slab_oracle",
            fromlist=["x"]).la_poly_slab_sql(op),
        desc=f"polygon x polygon {op} ({ref}): overlay-kernel pieces, "
             "cell-join candidates, per-feature cogroup folds; oracle "
             "= independent SQL slab-decomposition trapezoid areas",
    )(q)


_mk_poly_query("intersection", la.poly_intersection, "ogrlayer.cpp:3345")
_mk_poly_query("erase", la.poly_erase, "ogrlayer.cpp:5806")
_mk_poly_query("clip", la.poly_clip, "ogrlayer.cpp:5497")
_mk_poly_query("identity", la.poly_identity, "ogrlayer.cpp:4730")
_mk_poly_query("union", la.poly_union, "ogrlayer.cpp:3763")
_mk_poly_query("symdifference", la.poly_sym_difference, "ogrlayer.cpp:4300")
_mk_poly_query("update", la.poly_update, "ogrlayer.cpp:5148")


@register(
    "cascaded_union",
    sql=lambda: __import__(
        "gdal_spark.queries._slab_oracle",
        fromlist=["x"]).cascaded_union_slab_sql(),
    desc="UnionCascaded (ogrgeometry.cpp:5131): crc32-partitioned "
         "partial unions then a final tree merge; total union area vs "
         "the independent SQL slab-decomposition measure",
)
def cascaded_union_q(spark, sf_dir):
    a, b = _poly_ab(spark)
    both = a.select("wkb").unionByName(b.select("wkb"))
    return (la.cascaded_union(both)
            .agg(F.round(F.sum("area"), 3).alias("area")))


# --------------------------------------------- line-layer clip (r2)
_LC_N = 200

_LA_LINE_CLIP_SQL = f"""
    WITH seg AS (
      SELECT k.i AS afid,
             (k.i * 3) % 40 + 0.25 AS x0, (k.i * 7) % 40 + 0.5 AS y0,
             (k.i * 11) % 40 + 0.75 AS x1, (k.i * 5) % 40 + 0.25 AS y1
      FROM generate_series(0, {_LC_N - 1}) k(i)
    ),
    t AS (
      SELECT afid, x0, y0, x1 - x0 AS dx, y1 - y0 AS dy FROM seg
    ),
    slab AS (
      SELECT afid, dx, dy,
             LEAST((10 - x0) / dx, (30 - x0) / dx) AS txl,
             GREATEST((10 - x0) / dx, (30 - x0) / dx) AS txh,
             LEAST((8 - y0) / dy, (28 - y0) / dy) AS tyl,
             GREATEST((8 - y0) / dy, (28 - y0) / dy) AS tyh
      FROM t
    ),
    iv AS (
      SELECT afid, dx, dy,
             GREATEST(0.0, txl, tyl) AS t0,
             LEAST(1.0, txh, tyh) AS t1
      FROM slab
    )
    SELECT afid, CAST(COUNT(*) AS BIGINT) AS n_pieces,
           ROUND(SUM((t1 - t0) * SQRT(dx * dx + dy * dy)), 6) AS len
    FROM iv WHERE t1 > t0
    GROUP BY afid
    ORDER BY afid
"""


@register(
    "la_line_clip",
    sql=_LA_LINE_CLIP_SQL,
    desc="line-layer x polygon-layer Clip (ogrlayer.cpp Clip :3580, "
         "line-areal role): covering-cell candidate pairs + line-clip "
         "kernel per pair; oracle = independent Liang-Barsky slab "
         "clipping of the same derived segments against the rectangle",
)
def la_line_clip_q(spark, sf_dir):
    import pandas as pd

    from ..kernels import wkb as kwkb
    from ..kernels.cells import TileGrid
    from ..operators.layer_algebra import clip_lines

    rows = []
    for k in range(_LC_N):
        x0, y0 = (k * 3) % 40 + 0.25, (k * 7) % 40 + 0.5
        x1, y1 = (k * 11) % 40 + 0.75, (k * 5) % 40 + 0.25
        rows.append({"fid": k,
                     "wkb": kwkb.wkb_linestring(
                         np.array([[x0, y0], [x1, y1]])),
                     "xmin": min(x0, x1), "ymin": min(y0, y1),
                     "xmax": max(x0, x1), "ymax": max(y0, y1)})
    lines = spark.createDataFrame(pd.DataFrame(rows))
    rect = np.array([[10.0, 8.0], [30.0, 8.0], [30.0, 28.0],
                     [10.0, 28.0], [10.0, 8.0]])
    polys = spark.createDataFrame(pd.DataFrame([{
        "fid": 0, "wkb": kwkb.wkb_polygon([rect]),
        "xmin": 10.0, "ymin": 8.0, "xmax": 30.0, "ymax": 28.0}]))
    grid = TileGrid.local(0.0, 0.0, 40.0, 40.0, tile_size=64)
    out = clip_lines(lines, polys, grid, zoom=3)
    return (out.groupBy("afid")
            .agg(F.count("*").alias("n_pieces"),
                 F.round(F.sum("length"), 6).alias("len"))
            .orderBy("afid"))

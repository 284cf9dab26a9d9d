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
# polygons; pieces from the planar-overlay kernel (kernels/clip.py).
# Oracle = the serial twin in _goldens.la_poly_sql — the driver
# verifies the distributed cell-join pairing + cogroup folds.

def _poly_ab(spark):
    from ._goldens import _poly_layers
    a, b = _poly_layers()
    return spark.createDataFrame(a), spark.createDataFrame(b)


def _poly_out(df):
    return df.select("afid", "bfid", "area").orderBy(
        F.col("afid").asc_nulls_first(), F.col("bfid").asc_nulls_first(),
        "area")


def _mk_poly_query(op, la_fn, ref):
    def q(spark, sf_dir, _fn=la_fn):
        a, b = _poly_ab(spark)
        return _poly_out(_fn(a, b, dv.GRID, zoom=Z))

    register(
        f"la_poly_{op}",
        sql=lambda op=op: __import__(
            "gdal_spark.queries._goldens", fromlist=["x"]).la_poly_sql(op),
        desc=f"polygon x polygon {op} ({ref}): overlay-kernel pieces, "
             "cell-join candidates, per-feature cogroup folds",
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
        "gdal_spark.queries._goldens", fromlist=["x"]).cascaded_union_sql(),
    desc="UnionCascaded (ogrgeometry.cpp:5131): crc32-partitioned "
         "partial unions then a final tree merge; per-region areas",
)
def cascaded_union_q(spark, sf_dir):
    a, b = _poly_ab(spark)
    both = a.select("wkb").unionByName(b.select("wkb"))
    return la.cascaded_union(both).select("area").orderBy("area")

"""ST_* SQL surface — semantics mirror ogr_geos.py / ogr_geom.py
literal-WKT cases from the reference autotest."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.functions.st import register_st_functions
from gdal_spark.kernels import wkb as kwkb
from gdal_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def st(spark):
    register_st_functions(spark)
    spark.createDataFrame(fx.polygons_pandas()).createOrReplaceTempView("polyg")
    return spark


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_makepoint_accessors(st):
    assert _one(st, "st_x(st_makepoint(3.5, -2.0))") == 3.5
    assert _one(st, "st_y(st_makepoint(3.5, -2.0))") == -2.0
    assert _one(st, "st_astext(st_makepoint(1, 2))") == "POINT (1 2)"


def test_geomfromtext_roundtrip(st):
    assert _one(
        st, "st_astext(st_geomfromtext('POINT(10 20)'))") == "POINT (10 20)"
    area = _one(st, "st_area(st_geomfromtext("
                    "'POLYGON((0 0,4 0,4 3,0 3,0 0))'))")
    assert area == 12.0


def test_area_with_hole(st):
    area = _one(st, "st_area(st_geomfromtext("
                    "'POLYGON((0 0,10 0,10 10,0 10,0 0),"
                    "(2 2,4 2,4 4,2 4,2 2))'))")
    assert area == 100.0 - 4.0


def test_distance(st):
    assert _one(st, "st_distance(st_makepoint(0,0), st_makepoint(3,4))") == 5.0


def test_contains_within_intersects(st):
    sq = "st_geomfromtext('POLYGON((0 0,4 0,4 4,0 4,0 0))')"
    assert _one(st, f"st_contains({sq}, st_makepoint(2,2))") is True
    assert _one(st, f"st_contains({sq}, st_makepoint(5,5))") is False
    assert _one(st, f"st_within(st_makepoint(2,2), {sq})") is True
    assert _one(st, f"st_intersects(st_makepoint(2,2), {sq})") is True
    assert _one(st, f"st_intersects({sq}, st_makepoint(9,9))") is False


def test_length(st):
    # WKT linestring not supported by st_geomfromtext yet: build WKB
    ls = kwkb.wkb_linestring(np.array([[0.0, 0.0], [3.0, 4.0], [3.0, 8.0]]))
    df = st.createDataFrame([(bytearray(ls),)], "g binary")
    df.createOrReplaceTempView("lstr")
    got = st.sql("SELECT st_length(g) AS v FROM lstr").collect()[0]["v"]
    assert got == 9.0


def test_transform_roundtrip(st):
    x = _one(st, "st_x(st_transform(st_makepoint(10.0, 50.0), 3857))")
    assert abs(x - 1113194.9079327357) < 1e-6
    back = _one(st, "st_x(st_transform(st_transform("
                    "st_makepoint(10.0, 50.0), 3857), 4326))")
    assert abs(back - 10.0) < 1e-9


def test_on_fixture_layer(st):
    rows = st.sql(
        "SELECT fid, st_area(wkb) AS a, st_astext(st_centroid(wkb)) AS c "
        "FROM polyg ORDER BY fid"
    ).collect()
    assert len(rows) == 10
    assert all(r["a"] > 0 and r["c"].startswith("POINT") for r in rows)


# ---- set operations / relates (GEOS-role surface on kernels/clip) ----
SQ_A = "st_geomfromtext('POLYGON((0 0,4 0,4 4,0 4,0 0))')"
SQ_B = "st_geomfromtext('POLYGON((2 2,6 2,6 6,2 6,2 2))')"
SQ_ADJ = "st_geomfromtext('POLYGON((4 0,8 0,8 4,4 4,4 0))')"
SQ_FAR = "st_geomfromtext('POLYGON((10 10,11 10,11 11,10 11,10 10))')"


def test_st_set_ops_areas(st):
    assert _one(st, f"st_area(st_intersection({SQ_A}, {SQ_B}))") == 4.0
    assert _one(st, f"st_area(st_union({SQ_A}, {SQ_B}))") == 28.0
    assert _one(st, f"st_area(st_difference({SQ_A}, {SQ_B}))") == 12.0
    assert _one(st, f"st_area(st_symdifference({SQ_A}, {SQ_B}))") == 24.0
    assert _one(st, f"st_intersection({SQ_A}, {SQ_FAR})") is None


def test_st_touches_overlaps_equals(st):
    assert _one(st, f"st_touches({SQ_A}, {SQ_ADJ})") is True
    assert _one(st, f"st_touches({SQ_A}, {SQ_B})") is False
    assert _one(st, f"st_touches({SQ_A}, {SQ_FAR})") is False
    assert _one(st, f"st_overlaps({SQ_A}, {SQ_B})") is True
    assert _one(st, f"st_overlaps({SQ_A}, {SQ_ADJ})") is False
    assert _one(st, f"st_equals({SQ_A}, {SQ_A})") is True
    assert _one(st, f"st_equals({SQ_A}, {SQ_B})") is False
    # equality is point-set equality, not vertex-list equality
    rot = "st_geomfromtext('POLYGON((4 0,4 4,0 4,0 0,4 0))')"
    assert _one(st, f"st_equals({SQ_A}, {rot})") is True


def test_st_crosses_line_polygon(st):
    line_in_out = "st_geomfromtext('LINESTRING(-1 2, 5 2)')"
    # wait: geomfromtext supports POINT/POLYGON only; build via kernel
    import pandas as pd

    df = st.createDataFrame(pd.DataFrame({
        "line": [kwkb.wkb_linestring(np.array([(-1.0, 2.0), (5.0, 2.0)])),
                 kwkb.wkb_linestring(np.array([(1.0, 1.0), (2.0, 2.0)]))],
        "poly": [kwkb.wkb_polygon(
            [np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], float)])] * 2,
    }))
    df.createOrReplaceTempView("cr")
    rows = st.sql(
        "SELECT st_crosses(line, poly) AS c FROM cr").collect()
    assert [r["c"] for r in rows] == [True, False]


def test_st_convexhull_simplify_makevalid(st):
    hull_area = _one(st, "st_area(st_convexhull(st_geomfromtext("
                         "'POLYGON((0 0,4 0,2 1,4 4,0 4,0 0))')))")
    assert hull_area == 16.0
    simp = _one(st, "st_astext(st_simplify(st_geomfromtext("
                    "'POLYGON((0 0,2 0.0000001,4 0,4 4,0 4,0 0))'), 0.001))")
    assert simp == "POLYGON ((0 0,4 0,4 4,0 4,0 0))"
    # bowtie splits into two triangular lobes of area 1.0 each
    bow_area = _one(st, "st_area(st_makevalid(st_geomfromtext("
                        "'POLYGON((0 0,2 2,2 0,0 2,0 0))')))")
    assert bow_area == pytest.approx(2.0)


def test_st_buffer_point(st):
    a = _one(st, "st_area(st_buffer(st_makepoint(5, 5), 2.0))")
    # 32-gon area = 0.5*n*r^2*sin(2pi/n)
    assert a == pytest.approx(0.5 * 32 * 4.0 * math.sin(2 * math.pi / 32))


def test_st_spheroid_measures(st):
    a = _one(st, "st_area_spheroid(st_geomfromtext("
                 "'POLYGON((0 0,1 0,1 1,0 1,0 0))'))")
    assert a == pytest.approx(12364e6, rel=0.01)  # 1x1 deg at equator ~ 12364 km^2
    import pandas as pd

    df = st.createDataFrame(pd.DataFrame({
        "line": [kwkb.wkb_linestring(np.array([(0.0, 0.0), (1.0, 0.0)]))]}))
    df.createOrReplaceTempView("geo_l")
    ln = st.sql("SELECT st_length_spheroid(line) AS v FROM geo_l").collect()[0]["v"]
    assert ln == pytest.approx(111195, rel=0.001)  # 1 deg of longitude at equator


def test_st_buffer_polygon_and_line(st):
    """Polygon buffer area ~= A + P*d + pi*d^2 (Minkowski with a
    32-gon disc, slightly under pi); line capsule ~= 2*L*d + pi*d^2."""
    a = _one(st, f"st_area(st_buffer({SQ_A}, 1.0))")
    # square 4x4: A=16, P=16, d=1
    approx_pi = 16 * math.sin(2 * math.pi / 32)  # 32-gon "pi"
    assert abs(a - (16 + 16 + approx_pi)) < 0.2

    import numpy as np
    import pandas as pd

    from gdal_spark.kernels import wkb as kwkb2

    df = st.createDataFrame(pd.DataFrame({
        "line": [kwkb2.wkb_linestring(
            np.array([(0.0, 0.0), (10.0, 0.0)]))]}))
    df.createOrReplaceTempView("bl")
    cap = st.sql("SELECT st_area(st_buffer(line, 1.0)) AS v FROM bl"
                 ).collect()[0]["v"]
    assert abs(cap - (2 * 10 * 1 + approx_pi)) < 0.2
    # hole shrinks from both sides: donut buffer keeps the hole if wide
    donut = ("st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0),"
             "(4 4,6 4,6 6,4 6,4 4))')")
    ad = _one(st, f"st_area(st_buffer({donut}, 0.5))")
    # outer grows to ~11x11-ish, hole shrinks to ~1x1
    assert 110 < ad < 125


def test_st_intersection_line_polygon(st):
    """Mixed-type overlay: a line crossing a square is clipped to the
    inside span; difference keeps the outside spans; areal minus line
    is the areal operand unchanged."""
    import numpy as np

    from gdal_spark.kernels import wkb as kwkb

    sq = kwkb.wkb_polygon([np.array(
        [[2.0, 0.0], [6.0, 0.0], [6.0, 10.0], [2.0, 10.0], [2.0, 0.0]])])
    line = kwkb.wkb_linestring(np.array([[0.0, 5.0], [10.0, 5.0]]))
    df = st.createDataFrame([(bytearray(line), bytearray(sq))],
                            "l binary, p binary")
    df.createOrReplaceTempView("lp")
    row = st.sql(
        "SELECT st_astext(st_intersection(l, p)) AS i, "
        "       st_astext(st_intersection(p, l)) AS i2, "
        "       st_astext(st_difference(l, p)) AS d, "
        "       st_length(st_intersection(l, p)) AS len_in, "
        "       st_length(st_difference(l, p)) AS len_out, "
        "       st_area(st_difference(p, l)) AS area_keep "
        "FROM lp").collect()[0]
    assert "LINESTRING" in row["i"]
    assert row["i"] == row["i2"]
    assert abs(row["len_in"] - 4.0) < 1e-9
    assert abs(row["len_out"] - 6.0) < 1e-9        # 2 + 4 outside
    assert abs(row["area_keep"] - 40.0) < 1e-9


# ---- round-3 registry parity (ogrsqlitesqlfunctions.cpp:1188-1240) ----
BOWTIE = "st_geomfromtext('POLYGON((0 0,10 10,0 10,10 0,0 0))')"


def test_st_issimple(st):
    assert _one(st, f"st_issimple({SQ_A})") is True
    assert _one(st, f"st_issimple({BOWTIE})") is False
    assert _one(st, "st_issimple(st_makepoint(1, 2))") is True
    import pandas as pd

    df = st.createDataFrame(pd.DataFrame({
        "line": [kwkb.wkb_linestring(
                     np.array([(0.0, 0.0), (4.0, 4.0), (4.0, 0.0)])),
                 kwkb.wkb_linestring(
                     np.array([(0.0, 0.0), (4.0, 4.0), (4.0, 0.0),
                               (0.0, 4.0)]))]}))
    df.createOrReplaceTempView("simp_l")
    rows = st.sql("SELECT st_issimple(line) AS v FROM simp_l").collect()
    assert [r["v"] for r in rows] == [True, False]


def test_st_isvalid(st):
    assert _one(st, f"st_isvalid({SQ_A})") is True
    assert _one(st, f"st_isvalid({BOWTIE})") is False
    # hole outside the shell -> invalid
    escaped = ("st_geomfromtext('POLYGON((0 0,4 0,4 4,0 4,0 0),"
               "(10 10,11 10,11 11,10 11,10 10))')")
    assert _one(st, f"st_isvalid({escaped})") is False
    donut = ("st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0),"
             "(4 4,6 4,6 6,4 6,4 4))')")
    assert _one(st, f"st_isvalid({donut})") is True
    assert _one(st, "st_isvalid(st_makepoint(1, 2))") is True


def test_st_disjoint(st):
    assert _one(st, f"st_disjoint({SQ_A}, st_makepoint(2, 2))") is False
    assert _one(st, f"st_disjoint({SQ_A}, st_makepoint(9, 9))") is True
    assert _one(st, f"st_disjoint({SQ_A}, {SQ_FAR})") is True


def test_st_asbinary_geomfromwkb_srid(st):
    txt = _one(st, "st_astext(st_geomfromwkb(st_asbinary("
                   "st_makepoint(3, 4))))")
    assert txt == "POINT (3 4)"
    assert _one(st, "st_srid(st_makepoint(1, 1))") == 4326
    rt = _one(st, f"st_area(st_geomfromwkb(st_asbinary({SQ_A})))")
    assert rt == 16.0


def test_vectorized_contains_matches_scalar_10k(st):
    """The batched point-decode + per-unique-polygon ray-cast path
    must agree with the per-row fallback on 10k rows and not take
    per-row-Python time (the kernel call count is what matters; the
    wall bound just guards an accidental fallback)."""
    import time

    import pandas as pd

    from gdal_spark.functions import st as stmod

    polys = [kwkb.wkb_polygon([np.array(
        [(0.0, 0.0), (4.0 + k, 0.0), (4.0 + k, 4.0 + k), (0.0, 4.0 + k),
         (0.0, 0.0)])]) for k in range(5)]
    n = 10_000
    pa = pd.Series([polys[i % 5] for i in range(n)])
    pb = pd.Series([kwkb.wkb_point(float(i % 13), float(i % 11))
                    for i in range(n)])
    t0 = time.time()
    fast = stmod._st_contains(pa, pb)
    dt_fast = time.time() - t0
    assert stmod._decode_points_batch(pb) is not None  # batch path taken
    # force the scalar fallback by appending a non-point row, then
    # compare the overlapping prefix
    slow = pd.Series([stmod._contains_point(a, *kwkb.parse_wkb(bytes(b))[1])
                      for a, b in zip(pa[:500], pb[:500])])
    assert list(fast[:500]) == list(slow)
    assert dt_fast < 2.0, f"vectorized contains took {dt_fast:.2f}s for 10k"


def test_st_curvetoline(spark):
    import numpy as np
    from gdal_spark.functions.st import register_st_functions
    from gdal_spark.kernels import wkb as kw
    from gdal_spark.operators import curve as cv

    register_st_functions(spark)
    pts = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0],
                    [3.0, -1.0], [4.0, 0.0]])
    cs = kw.wkb_circularstring(pts)
    ls = kw.wkb_linestring(pts[:3])
    df = spark.createDataFrame(
        [(1, bytearray(cs)), (2, bytearray(ls))], "i long, g binary")
    df.createOrReplaceTempView("curves")
    rows = {r["i"]: bytes(r["o"]) for r in spark.sql(
        "SELECT i, ST_CurveToLine(g) AS o FROM curves").collect()}
    # linear geometry passes through byte-identical
    assert rows[2] == ls
    t, out = kw.parse_wkb(rows[1])
    assert t == kw.LINESTRING
    # parity with the distributed stroke
    vdf = spark.createDataFrame(
        [(1, i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "cs_id long, vi int, x double, y double")
    ref = sorted(cv.circularstring_to_line(vdf).collect(),
                 key=lambda r: r["vi"])
    assert len(out) == len(ref)
    for (x, y), r in zip(out, ref):
        assert abs(x - r["x"]) < 1e-9 and abs(y - r["y"]) < 1e-9


def test_st_curvetoline_multicurve(spark):
    import numpy as np
    from gdal_spark.functions.st import register_st_functions
    from gdal_spark.kernels import arc as karc
    from gdal_spark.kernels import wkb as kw

    register_st_functions(spark)
    line = np.array([[0.0, 0.0], [1.0, 0.0]])
    arc = np.array([[2.0, 0.0], [3.0, 1.0], [4.0, 0.0]])
    mc = kw.wkb_multicurve([(kw.LINESTRING, line), (kw.CIRCULARSTRING, arc)])
    df = spark.createDataFrame([(1, bytearray(mc))], "i long, g binary")
    df.createOrReplaceTempView("mc")
    out = bytes(spark.sql(
        "SELECT ST_CurveToLine(g) AS o FROM mc").first()["o"])
    t, parts = kw.parse_wkb(out)
    assert t == kw.MULTILINESTRING and len(parts) == 2
    np.testing.assert_array_equal(parts[0], line)
    ref = karc.circularstring_to_line(arc)
    assert len(parts[1]) == len(ref)
    np.testing.assert_allclose(parts[1], ref, atol=1e-12)


# ---- registry stragglers: boundary / setprecision / delaunay /
# polygonize (ogrgeometry.cpp:4403,6610,6706,6791 roles) -----------------
def test_boundary(st):
    # polygon with hole -> multilinestring of both rings
    wkt = _one(st, "st_astext(st_boundary(st_geomfromtext("
                   "'POLYGON((0 0,4 0,4 3,0 3,0 0),(1 1,2 1,1 2,1 1))')))")
    assert wkt.startswith("MULTILINESTRING")
    assert "(1 1" in wkt
    # single-ring polygon -> plain linestring
    wkt = _one(st, "st_astext(st_boundary(st_geomfromtext("
                   "'POLYGON((0 0,4 0,0 3,0 0))')))")
    assert wkt.startswith("LINESTRING")
    # open linestring -> its endpoints; closed -> empty multipoint
    wkt = _one(st, "st_astext(st_boundary(st_geomfromtext("
                   "'LINESTRING(0 0,5 5,9 0)')))")
    assert wkt == "MULTIPOINT (0 0, 9 0)" or "0 0" in wkt
    empty = _one(st, "st_boundary(st_geomfromtext("
                     "'LINESTRING(0 0,5 5,0 0)'))")
    t, parts = kwkb.parse_wkb(bytes(empty))
    assert t == kwkb.MULTIPOINT and parts == []


def test_setprecision(st):
    out = _one(st, "st_astext(st_setprecision(st_geomfromtext("
                   "'POINT(1.26 -3.74)'), 0.5))")
    assert out == "POINT (1.5 -3.5)"
    # grid 0 -> unchanged
    out = _one(st, "st_astext(st_setprecision(st_geomfromtext("
                   "'POINT(1.26 -3.74)'), 0.0))")
    assert out == "POINT (1.26 -3.74)"
    # polygon ring snapped to integer grid
    out = _one(st, "st_area(st_setprecision(st_geomfromtext("
                   "'POLYGON((0.1 0.1,3.9 0.2,4.1 2.9,0.2 3.1,0.1 0.1))'),"
                   " 1.0))")
    assert out == 12.0


def test_delaunay_triangulation(st):
    # 4 corner points of a unit square -> 2 triangles, total area 1
    blob = _one(st, "st_delaunaytriangulation(st_geomfromtext("
                    "'MULTIPOINT(0 0, 1 0, 0 1, 1 1)'))")
    t, parts = kwkb.parse_wkb(bytes(blob))
    assert t == kwkb.GEOMETRYCOLLECTION and len(parts) == 2
    from gdal_spark.kernels.geom import polygon_area
    total = sum(polygon_area(p) for pt, p in parts)
    assert total == pytest.approx(1.0)
    # degenerate: under 3 distinct points -> empty collection
    blob = _one(st, "st_delaunaytriangulation(st_makepoint(1, 2))")
    assert kwkb.parse_wkb(bytes(blob))[1] == []


def test_polygonize(st):
    blob = _one(st, "st_polygonize(st_geomfromtext("
                    "'MULTILINESTRING((0 0,4 0,4 3,0 0),(9 9,9 8))'))")
    t, parts = kwkb.parse_wkb(bytes(blob))
    assert t == kwkb.GEOMETRYCOLLECTION and len(parts) == 1
    pt, rings = parts[0]
    assert pt == kwkb.POLYGON
    from gdal_spark.kernels.geom import polygon_area
    assert polygon_area(rings) == 6.0


def test_convexhull_simplify_batch_matches_scalar(monkeypatch):
    """The _chains_by_row batch paths of _st_convexhull/_st_simplify
    return byte-identical WKB to the per-row fallback (and the
    scalar-arithmetic convex_hull rewrite is pinned bit-identical to
    the np.cross formulation by construction — same IEEE expression)."""
    import random

    import pandas as pd

    import gdal_spark.functions.st as stm

    random.seed(7)
    rng = np.random.default_rng(7)

    def rnd_poly():
        cx, cy = rng.uniform(-50, 50, 2)
        ang = np.sort(rng.uniform(0, 2 * math.pi, rng.integers(3, 9)))
        r = rng.uniform(1, 3, len(ang))
        ring = np.column_stack([cx + r * np.cos(ang),
                                cy + r * np.sin(ang)])
        return kwkb.wkb_polygon([np.vstack([ring, ring[:1]])])

    def rnd_line():
        return kwkb.wkb_linestring(
            rng.uniform(-50, 50, (int(rng.integers(2, 12)), 2)))

    blobs = [rnd_poly() if rng.random() < 0.5 else rnd_line()
             for _ in range(200)] + [None]
    s = pd.Series(blobs, dtype=object)
    tol = pd.Series([0.5] * len(s))

    hull_b = stm._st_convexhull(s)
    simp_b = stm._st_simplify(s, tol)
    monkeypatch.setattr(stm, "_chains_by_row", lambda *a, **k: None)
    hull_s = stm._st_convexhull(s)
    simp_s = stm._st_simplify(s, tol)
    for a, b in zip(hull_b, hull_s):
        assert (a is None) == (b is None)
        assert a is None or bytes(a) == bytes(b)
    for a, b in zip(simp_b, simp_s):
        assert (a is None) == (b is None)
        assert a is None or bytes(a) == bytes(b)

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

"""Transverse Mercator (UTM) Column-math transformer.

Anchors:
* Snyder PP-1395 worked example 8 (p. 269-270, Clarke 1866, zone 18):
  an INDEPENDENT published golden, not a twin of our code;
* forward-then-inverse round-trip over an in-zone grid (series is
  sub-mm in-zone, so recovery to ~1e-7 deg proves both directions);
* central-meridian invariants (x == FE, y == k0 * meridian arc).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import tmerc as tm


def _one(spark, lon, lat, zone, ellps, fwd=True):
    df = spark.createDataFrame([(lon, lat)], "u double, v double")
    if fwd:
        out = tm.utm_forward(df, "u", "v", zone, ellps=ellps)
        return out.select("tmx", "tmy").first()
    out = tm.utm_inverse(df, "u", "v", zone, ellps=ellps)
    return out.select("tmlon", "tmlat").first()


def test_snyder_worked_example(spark):
    # Snyder PP-1395 example for eqs. 8-9/8-10: Clarke 1866,
    # phi = 40d30' N, lam = 73d30' W, zone 18 (lam0 = 75W, k0=0.9996):
    # x = 127,106.5 m + FE, y = 4,484,124.4 m.
    r = _one(spark, -73.5, 40.5, 18, tm.CLARKE_1866)
    assert abs(r["tmx"] - (500000.0 + 127106.5)) < 1.0
    assert abs(r["tmy"] - 4484124.4) < 1.0


def test_snyder_inverse_example(spark):
    # Same point back through eqs. 8-17/8-18.
    r = _one(spark, 627106.5, 4484124.4, 18, tm.CLARKE_1866, fwd=False)
    assert abs(r["tmlon"] - (-73.5)) < 1e-5
    assert abs(r["tmlat"] - 40.5) < 1e-5


def test_central_meridian_invariants(spark):
    # On the central meridian: easting == FE exactly (aa == 0 kills
    # every x term), northing == k0 * meridian arc M(phi).
    r = _one(spark, tm.utm_lon0(18), 45.0, 18, tm.WGS84)
    assert abs(r["tmx"] - tm.UTM_FE) < 1e-6
    a, f = tm.WGS84
    e2 = f * (2.0 - f)
    c0, c2, c4, c6 = tm._mcoef(e2)
    phi = math.radians(45.0)
    mm = a * (c0 * phi - c2 * math.sin(2 * phi)
              + c4 * math.sin(4 * phi) - c6 * math.sin(6 * phi))
    assert abs(r["tmy"] - tm.UTM_K0 * mm) < 1e-6


@pytest.mark.parametrize("zone", [1, 18, 31, 60])
def test_roundtrip_grid(spark, zone):
    lon0 = tm.utm_lon0(zone)
    pts = [(lon0 + dl, lat)
           for dl in (-2.9, -1.5, 0.0, 1.5, 2.9)
           for lat in (0.5, 20.0, 45.0, 70.0, 83.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = tm.utm_forward(df, "lon", "lat", zone)
    back = tm.utm_inverse(fwd, "tmx", "tmy", zone)
    err = back.select(
        F.max(F.abs(F.col("tmlon") - F.col("lon"))).alias("elon"),
        F.max(F.abs(F.col("tmlat") - F.col("lat"))).alias("elat")).first()
    assert err["elon"] < 1e-7 and err["elat"] < 1e-7


def test_no_udf_in_plan(spark):
    # The whole transform must stay JVM-side: no BatchEvalPython /
    # ArrowEvalPython stage in the physical plan.
    df = spark.range(100).select(
        (F.col("id") * 0.01 - 75.0).alias("lon"),
        (F.col("id") * 0.1 + 1.0).alias("lat"))
    out = tm.utm_forward(df, "lon", "lat", 18)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_numpy_twin_matches_column_path(spark):
    import numpy as np

    from gdal_spark.kernels import geom as kg

    pts = [(tm.utm_lon0(18) + dl, lat)
           for dl in (-2.5, 0.0, 2.5) for lat in (5.0, 45.0, 75.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    col = tm.utm_forward(df, "lon", "lat", 18).orderBy("lon", "lat") \
        .collect()
    lon = np.array(sorted(p[0] for p in pts))
    arr = sorted(pts)
    nx, ny = kg.tmerc_forward(np.array([p[0] for p in arr]),
                              np.array([p[1] for p in arr]),
                              tm.utm_lon0(18))
    for r, ex, ey in zip(col, nx, ny):
        assert abs(r["tmx"] - ex) < 1e-6 and abs(r["tmy"] - ey) < 1e-6


def test_st_transform_utm(spark):
    from gdal_spark.functions.st import register_st_functions
    from gdal_spark.kernels import geom as kg, wkb as kwkb

    register_st_functions(spark)
    df = spark.createDataFrame(
        [(bytearray(kwkb.wkb_point(-73.5, 40.5)),)], "g binary")
    df.createOrReplaceTempView("tgeo")
    r = spark.sql(
        "SELECT ST_X(ST_Transform(g, 32618)) AS x,"
        " ST_Y(ST_Transform(g, 32618)) AS y FROM tgeo").first()
    ex, ey = kg.tmerc_forward(-73.5, 40.5, -75.0)
    assert abs(r["x"] - float(ex)) < 1e-9 and abs(r["y"] - float(ey)) < 1e-9
    # south zone: false northing 10,000,000
    df2 = spark.createDataFrame(
        [(bytearray(kwkb.wkb_point(151.2, -33.8)),)], "g binary")
    df2.createOrReplaceTempView("tgeo2")
    r2 = spark.sql(
        "SELECT ST_Y(ST_Transform(g, 32756)) AS y FROM tgeo2").first()
    assert 5_000_000 < r2["y"] < 10_000_000

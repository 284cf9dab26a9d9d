"""Zonal statistics over rasterize_tiles-burned zones, checked
against a straight numpy reference on the assembled rasters."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels.cells import TileGrid
from gdal_spark.operators.raster_tile import rasterize_tiles, zonal_stats
from gdal_spark.sources import fixtures as fx


def _assemble(tiles_pdf, ts, n, dtype):
    a = np.zeros((n, n), dtype=dtype)
    for _, r in tiles_pdf.iterrows():
        t = np.frombuffer(r["px"], dtype=dtype).reshape(ts, ts)
        a[int(r["ty"]) * ts:(int(r["ty"]) + 1) * ts,
          int(r["tx"]) * ts:(int(r["tx"]) + 1) * ts] = t
    return a


@pytest.fixture(scope="module")
def zonal_case(spark):
    ts, zoom = 64, 3
    grid = TileGrid.local(*fx.POLY_BBOX, tile_size=ts)
    polys = spark.createDataFrame(fx.polygons_pandas())
    zones = rasterize_tiles(polys, grid, zoom, value_col="eas_id",
                            tile_size=ts).select("tx", "ty", "px")

    n = (1 << zoom) * ts

    def _vals(key, pdf):
        idx = np.arange(n * n).reshape(n, n)
        v = ((idx * 37 + 11) % 256).astype(np.uint8)
        rows = []
        for tyy in range(1 << zoom):
            for txx in range(1 << zoom):
                rows.append({"tx": txx, "ty": tyy,
                             "px": v[tyy * ts:(tyy + 1) * ts,
                                     txx * ts:(txx + 1) * ts].tobytes()})
        return pd.DataFrame(rows)

    values = (spark.range(1).withColumn("_g", F.lit(1)).groupBy("_g")
              .applyInPandas(_vals, "tx long, ty long, px binary"))
    return zones, values, ts, n


def test_zonal_matches_numpy(spark, zonal_case):
    zones, values, ts, n = zonal_case
    out = zonal_stats(values, zones, dtype="uint8", zone_dtype="uint8")
    got = {int(r["zone"]): r for r in out.collect()}

    z = _assemble(zones.toPandas(), ts, n, np.uint8)
    idx = np.arange(n * n).reshape(n, n)
    v = ((idx * 37 + 11) % 256).astype(np.float64)
    want_zones = set(np.unique(z)) - {0}
    assert set(got) == want_zones and len(got) > 1
    for zid in want_zones:
        vv = v[z == zid]
        r = got[int(zid)]
        assert r["n_pixels"] == vv.size
        assert r["vmin"] == vv.min() and r["vmax"] == vv.max()
        assert r["vsum"] == vv.sum()
        assert abs(r["vmean"] - vv.mean()) < 1e-12


def test_zone_tile_split_invariance(spark, zonal_case):
    # Same stats whether tiles arrive as one partition or many.
    zones, values, ts, n = zonal_case
    a = zonal_stats(values, zones).orderBy("zone").collect()
    b = zonal_stats(values.repartition(16), zones.repartition(7)) \
        .orderBy("zone").collect()
    assert a == b

"""Focal operators: tile-split invariance via halo exchange."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gdal_spark.kernels import focal as kf
from gdal_spark.operators.focal import focal_tiles

TS, N = 16, 4


def _dem():
    rng = np.random.RandomState(11)
    base = rng.randint(0, 200, size=(N * TS, N * TS))
    yy, xx = np.mgrid[0:N * TS, 0:N * TS]
    return (base + 0.3 * xx + 0.7 * yy).astype(np.float64).round(1)


def _tiles_df(spark, arr):
    rows = [
        {"tx": tx, "ty": ty,
         "px": bytearray(arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
                         .astype(np.float32).tobytes())}
        for ty in range(N) for tx in range(N)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.mark.parametrize("kernel",
                         ["hillshade", "slope", "aspect", "tpi", "tri",
                          "roughness", "hillshade_zt", "slope_zt",
                          "aspect_zt", "hillshade_combined",
                          "hillshade_multidirectional",
                          "hillshade_igor"])
def test_focal_tile_split_invariance(spark, kernel):
    arr = _dem().astype(np.float32).astype(np.float64)
    rows = focal_tiles(_tiles_df(spark, arr), kernel, zoom=2,
                       ewres=2.0, nsres=3.0, dtype="float32",
                       tile_size=TS).collect()
    assert len(rows) == N * N
    got = np.full((N * TS, N * TS), np.nan, dtype=np.float32)
    for r in rows:
        tile = np.frombuffer(r["px"], dtype=np.float32).reshape(TS, TS)
        got[r["ty"] * TS:(r["ty"] + 1) * TS,
            r["tx"] * TS:(r["tx"] + 1) * TS] = tile
    want = kf.focal_array(arr, kernel, ewres=2.0, nsres=3.0).astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got[~np.isnan(got)], want[~np.isnan(want)],
                               rtol=0, atol=0)

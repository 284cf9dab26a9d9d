"""Warp: Column reprojection matches the numpy kernels; tile warp is
tile-split invariant vs a direct numpy warp of the assembled array."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gdal_spark.kernels import geom as kgeom
from gdal_spark.kernels.cells import TileGrid
from gdal_spark.operators.warp import reproject_points, warp_tiles


def test_point_reprojection_matches_kernel(spark):
    import pyspark.sql.functions as F

    df = spark.range(300).select(
        ((F.col("id") % 360) - 180 + 0.25).alias("lon"),
        ((F.col("id") % 170) - 85 + 0.5).alias("lat"),
    )
    rows = reproject_points(df, "lon", "lat", "to_mercator").collect()
    for r in rows:
        kx, ky = kgeom.lonlat_to_mercator(r["lon"], r["lat"])
        assert abs(r["lon_out"] - float(kx)) < 1e-6
        assert abs(r["lat_out"] - float(ky)) < 1e-6

    back = reproject_points(
        reproject_points(df, "lon", "lat", "to_mercator")
        .select(F.col("lon_out").alias("x"), F.col("lat_out").alias("y"),
                "lon", "lat"),
        "x", "y", "to_lonlat").collect()
    for r in back:
        assert abs(r["x_out"] - r["lon"]) < 1e-9
        assert abs(r["y_out"] - r["lat"]) < 1e-7


TS, N = 16, 2


def _src():
    rng = np.random.RandomState(21)
    return rng.randint(1, 255, size=(N * TS, N * TS)).astype(np.uint8)


def _tiles_df(spark, arr):
    rows = [
        {"tx": tx, "ty": ty,
         "px": bytearray(arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
                         .tobytes())}
        for ty in range(N) for tx in range(N)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_warp_identity_regrid(spark):
    """Regrid to a shifted/scaled grid in the same CRS — every output
    pixel must equal the nearest source pixel of the assembled array."""
    src = _src()
    src_grid = TileGrid(0.0, 32.0, 32.0, TS)          # src: 32x32 world units
    dst_grid = TileGrid(4.0, 30.0, 16.0, TS)          # zoomed window, res 0.5x
    out = warp_tiles(_tiles_df(spark, src), src_grid, 1, dst_grid, 1,
                     direction="identity",
                     src_tile_size=TS, dst_tile_size=TS).collect()
    assert len(out) == 4
    sres = src_grid.resolution(1)
    for r in out:
        got = np.frombuffer(r["px"], dtype=np.uint8).reshape(TS, TS)
        minx, miny, maxx, maxy = dst_grid.tile_bounds(1, r["tx"], r["ty"])
        res = dst_grid.resolution(1)
        cx = minx + (np.arange(TS) + 0.5) * res
        cy = maxy - (np.arange(TS) + 0.5) * res
        gx, gy = np.meshgrid(cx, cy)
        spx = np.floor((gx - src_grid.top_left_x) / sres).astype(int)
        spy = np.floor((src_grid.top_left_y - gy) / sres).astype(int)
        want = np.zeros_like(got)
        m = (spx >= 0) & (spx < src.shape[1]) & (spy >= 0) & (spy < src.shape[0])
        want[m] = src[spy[m], spx[m]]
        np.testing.assert_array_equal(got, want)


def test_warp_mercator(spark):
    """EPSG:4326 source -> EPSG:3857 destination grid."""
    src = _src()
    # source: lon/lat window [0,32]x[0,32] degrees
    src_grid = TileGrid(0.0, 32.0, 32.0, TS)
    # dst: mercator window covering the same area
    x0, _ = kgeom.lonlat_to_mercator(0.0, 0.0)
    x1, y1 = kgeom.lonlat_to_mercator(32.0, 32.0)
    dst_grid = TileGrid(float(x0), float(y1), float(x1 - x0), TS)
    out = warp_tiles(_tiles_df(spark, src), src_grid, 1, dst_grid, 1,
                     direction="dst_merc_src_ll",
                     src_tile_size=TS, dst_tile_size=TS).collect()
    assert len(out) == 4
    vals = np.concatenate([
        np.frombuffer(r["px"], dtype=np.uint8) for r in out])
    # warped output draws from the source's value set (nearest sampling)
    assert set(np.unique(vals)) <= set(np.unique(src)) | {0}
    assert (vals > 0).mean() > 0.9


def test_warp_bilinear_same_res_identity(spark):
    """Bilinear at identical src/dst grids samples pixel centers
    exactly (dx=dy=0) -> output equals input."""
    import numpy as np
    import pandas as pd

    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.warp import warp_tiles

    ts = 16
    rng = np.random.default_rng(7)
    tiles = []
    for ty in range(2):
        for tx in range(2):
            tiles.append({"tx": tx, "ty": ty,
                          "px": rng.integers(0, 255, (ts, ts),
                                             dtype=np.uint8).tobytes()})
    df = spark.createDataFrame(pd.DataFrame(tiles))
    g = TileGrid(0.0, 32.0, 32.0, ts)
    out = warp_tiles(df, g, 1, g, 1, dtype="uint8", src_tile_size=ts,
                     dst_tile_size=ts, method="bilinear")
    got = {(r["tx"], r["ty"]): r["px"] for r in out.collect()}
    want = {(t["tx"], t["ty"]): t["px"] for t in tiles}
    assert got == want


def test_warp_cubic_constant_field(spark):
    """Cubic convolution of a constant field is the constant."""
    import numpy as np
    import pandas as pd

    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.warp import warp_tiles

    ts = 16
    tiles = [{"tx": tx, "ty": ty,
              "px": np.full((ts, ts), 77, dtype=np.uint8).tobytes()}
             for ty in range(2) for tx in range(2)]
    df = spark.createDataFrame(pd.DataFrame(tiles))
    src = TileGrid(0.0, 32.0, 32.0, ts)
    dst = TileGrid(3.0, 29.0, 25.0, 10)   # offset + odd res -> fractional
    out = warp_tiles(df, src, 1, dst, 0, dtype="uint8", src_tile_size=ts,
                     dst_tile_size=10, method="cubic")
    rows = out.collect()
    assert rows
    for r in rows:
        a = np.frombuffer(r["px"], dtype=np.uint8)
        assert (a == 77).all()


def test_pyramid_rms_and_mode(spark):
    """RMS matches the integer-exact overview.cpp formula; mode picks
    the first raster-order value reaching max multiplicity."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.raster_tile import pyramid_reduce

    ts = 8
    a = np.arange(ts * ts, dtype=np.uint8).reshape(ts, ts)
    a[0, 0], a[0, 1], a[1, 0], a[1, 1] = 5, 9, 9, 3   # window with a tie
    tiles = spark.createDataFrame(pd.DataFrame([{
        "z": 1, "tx": 0, "ty": 0, "band": 1, "px": a.tobytes(),
        "checksum": 0}]))
    rms = pyramid_reduce(tiles, 1, method="rms", tile_size=ts).collect()[0]
    # the parent canvas holds 2x2 children; ours is the top-left one
    got = np.frombuffer(rms["px"], dtype=np.uint8).reshape(ts, ts)[
        :ts // 2, :ts // 2]
    # reference formula per window
    c = a.astype(np.int64)
    ss = (c[::2, ::2]**2 + c[::2, 1::2]**2 + c[1::2, ::2]**2
          + c[1::2, 1::2]**2)
    s1 = (ss + 1) // 4
    want = np.sqrt(s1.astype(np.float32)).astype(np.int64)
    want = np.where(want * (want + 1) < s1, want + 1, want)
    assert (got == want.astype(np.uint8)).all()

    mode = pyramid_reduce(tiles, 1, method="mode", tile_size=ts).collect()[0]
    gm = np.frombuffer(mode["px"], dtype=np.uint8).reshape(ts, ts)[
        :ts // 2, :ts // 2]
    assert gm[0, 0] == 9          # 9 appears twice
    assert gm[0, 1] == a[0, 2]    # all distinct -> first in raster order


def test_warp_area_kernels_vs_numpy(spark):
    """average/sum/min/max/rms over an exact 2x downsample window
    must equal the naive numpy reduction of each 2x2 block."""
    import numpy as np
    import pandas as pd

    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.warp import warp_tiles

    ts = 16
    rng = np.random.default_rng(11)
    full = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    tiles = [{"tx": tx, "ty": ty,
              "px": full[ty * ts:(ty + 1) * ts,
                         tx * ts:(tx + 1) * ts].tobytes()}
             for ty in range(2) for tx in range(2)]
    df = spark.createDataFrame(pd.DataFrame(tiles))
    src = TileGrid(0.0, 32.0, 32.0, ts)
    dst = TileGrid(0.0, 32.0, 32.0, 16)   # zoom0 16px -> res 2: 2x2 windows
    blocks = full.astype(np.float64).reshape(16, 2, 16, 2).transpose(
        0, 2, 1, 3).reshape(16, 16, 4)
    want = {
        "average": np.floor(blocks.mean(axis=2) + 0.5),
        "sum": np.minimum(np.floor(blocks.sum(axis=2) + 0.5), 255),
        "min": blocks.min(axis=2),
        "max": blocks.max(axis=2),
        "rms": np.floor(np.sqrt((blocks ** 2).mean(axis=2)) + 0.5),
    }
    for method, exp in want.items():
        out = warp_tiles(df, src, 1, dst, 0, dtype="uint8",
                         src_tile_size=ts, dst_tile_size=16,
                         method=method).collect()
        assert len(out) == 1, method
        got = np.frombuffer(out[0]["px"], dtype=np.uint8).reshape(16, 16)
        assert (got == exp.astype(np.uint8)).all(), method


def test_warp_spline_lanczos_constant_field(spark):
    """B-spline / Lanczos of a constant field is the constant
    (weight normalization makes the kernels exact on constants)."""
    ts = 16
    tiles = [{"tx": tx, "ty": ty,
              "px": np.full((ts, ts), 99, dtype=np.uint8).tobytes()}
             for ty in range(2) for tx in range(2)]
    df = spark.createDataFrame(pd.DataFrame(tiles))
    src = TileGrid(0.0, 32.0, 32.0, ts)
    dst = TileGrid(8.0, 24.0, 16.0, 8)
    for method in ("cubicspline", "lanczos"):
        out = warp_tiles(df, src, 1, dst, 0, dtype="uint8",
                         src_tile_size=ts, dst_tile_size=8, method=method)
        rows = out.collect()
        assert rows
        for r in rows:
            assert (np.frombuffer(r["px"], dtype=np.uint8) == 99).all()


def test_warp_mode_tie_first_in_scan(spark):
    """GDAL GWKTS_First mode ties: the value that reaches the max
    count earliest in the y-major source scan wins
    (gdalwarpkernel.cpp:7396-7427).  Source 2x2 block [5,3;3,5]:
    counts tie 2-2, 3 reaches count 2 at scan pos 2 < 5's pos 3."""
    ts = 8
    arr = np.zeros((ts, ts), dtype=np.uint8)
    arr[0:2, 0:2] = [[5, 3], [3, 5]]
    arr[2:4, 2:4] = [[9, 9], [4, 4]]   # tie 2-2: 9 finishes first
    df = spark.createDataFrame(pd.DataFrame(
        [{"tx": 0, "ty": 0, "px": arr.tobytes()}]))
    g = TileGrid(0.0, 8.0, 8.0, ts)
    dst = TileGrid(0.0, 8.0, 8.0, 4)          # 2:1 -> 2x2 footprints
    out = warp_tiles(df, g, 0, dst, 0, dtype="uint8", src_tile_size=ts,
                     dst_tile_size=4, method="mode").collect()
    got = np.frombuffer(out[0]["px"], dtype=np.uint8).reshape(4, 4)
    assert got[0, 0] == 3
    assert got[1, 1] == 9


def test_warp_quantile_rule(spark):
    """med/q1/q3 pick sorted[ceil(q*n - 1)] with NO interpolation
    (gdalwarpkernel.cpp:7603-7607).  2x2 footprint {10,20,30,40}:
    med -> ceil(1) = idx 1 -> 20; q1 -> idx 0 -> 10; q3 -> idx 2 -> 30."""
    ts = 8
    arr = np.zeros((ts, ts), dtype=np.uint8)
    arr[0:2, 0:2] = [[10, 20], [30, 40]]
    df = spark.createDataFrame(pd.DataFrame(
        [{"tx": 0, "ty": 0, "px": arr.tobytes()}]))
    g = TileGrid(0.0, 8.0, 8.0, ts)
    dst = TileGrid(0.0, 8.0, 8.0, 4)
    want = {"med": 20, "q1": 10, "q3": 30}
    for method, exp in want.items():
        out = warp_tiles(df, g, 0, dst, 0, dtype="uint8", src_tile_size=ts,
                         dst_tile_size=4, method=method).collect()
        got = np.frombuffer(out[0]["px"], dtype=np.uint8).reshape(4, 4)
        assert got[0, 0] == exp, method


def test_pyramid_cubic_interior_matches_serial(spark):
    """Cubic 2:1 decimation (overview.cpp convolution path, scaled
    8-tap dyadic weights): the distributed halo-exchange result must
    equal a serial separable convolution of the full mosaic away from
    the global edge (and at the edge, renormalized over valid taps)."""
    from gdal_spark.operators.raster_tile import (
        _CUBIC2X_W, build_pyramid)

    ts, n = 16, 2
    rng = np.random.RandomState(3)
    full = rng.randint(0, 255, size=(n * ts, n * ts)).astype(np.uint8)
    tiles = [{"z": 1, "tx": tx, "ty": ty, "band": 1,
              "px": full[ty * ts:(ty + 1) * ts,
                         tx * ts:(tx + 1) * ts].tobytes(), "checksum": 0}
             for ty in range(n) for tx in range(n)]
    df = spark.createDataFrame(pd.DataFrame(tiles))
    pyr = build_pyramid(df, 1, down_to=0, method="cubic", tile_size=ts)
    got_rows = [r for r in pyr.collect() if r["z"] == 0]
    assert len(got_rows) == 1
    got = np.frombuffer(got_rows[0]["px"], dtype=np.uint8).reshape(ts, ts)

    # serial twin over the full mosaic with the same edge renorm
    pad = np.full((n * ts + 6, n * ts + 6), np.nan)
    pad[3:-3, 3:-3] = full

    def conv(p):
        n_out = (p.shape[1] - 6) // 2
        num = np.zeros((p.shape[0], n_out))
        den = np.zeros((p.shape[0], n_out))
        for m, w in enumerate(_CUBIC2X_W):
            v = p[:, m:m + 2 * n_out:2]
            ok = ~np.isnan(v)
            num += np.where(ok, w * np.where(ok, v, 0.0), 0.0)
            den += np.where(ok, w, 0.0)
        return num / den

    want = conv(conv(pad).T).T
    want = np.clip(np.floor(want + 0.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_pansharpen_identity_property(spark):
    """Equal spectral bands with weights summing to 1: pseudo-pan ==
    the band, factor == pan/band, output == pan exactly (WeightedBrovey3
    algebra)."""
    from gdal_spark.operators.pansharpen import pansharpen_tiles

    ts = 16
    rng = np.random.RandomState(2)
    pan_full = rng.randint(1, 255, size=(2 * ts, 2 * ts)).astype(np.uint8)
    pan = spark.createDataFrame(pd.DataFrame(
        [{"tx": tx, "ty": ty,
          "px": pan_full[ty * ts:(ty + 1) * ts,
                         tx * ts:(tx + 1) * ts].tobytes()}
         for ty in range(2) for tx in range(2)]))
    ms = spark.createDataFrame(pd.DataFrame(
        [{"band": b, "tx": 0, "ty": 0,
          "px": np.full((ts, ts), 40, dtype=np.uint8).tobytes()}
         for b in (0, 1)]))
    grid = TileGrid(0.0, float(2 * ts), float(2 * ts), ts)
    out = pansharpen_tiles(pan, ms, grid, ms_zoom=0, pan_zoom=1,
                           weights=[0.5, 0.5], bands=[0, 1],
                           method="bilinear", ms_tile_size=ts,
                           pan_tile_size=ts).collect()
    assert len(out) == 8          # 4 tiles x 2 bands
    for r in out:
        got = np.frombuffer(r["px"], dtype=np.uint8).reshape(ts, ts)
        want = pan_full[r["ty"] * ts:(r["ty"] + 1) * ts,
                        r["tx"] * ts:(r["tx"] + 1) * ts]
        np.testing.assert_array_equal(got, want)


def test_pyramid_gauss_interior_matches_serial(spark):
    """Gauss 2:1 (overview.cpp:1827-1960): forward 3x3 [1,2,1]^2
    window, renormalized at edges; distributed == serial."""
    from gdal_spark.operators.raster_tile import build_pyramid

    ts, n = 16, 2
    rng = np.random.RandomState(8)
    full = rng.randint(0, 255, size=(n * ts, n * ts)).astype(np.uint8)
    tiles = [{"z": 1, "tx": tx, "ty": ty, "band": 1,
              "px": full[ty * ts:(ty + 1) * ts,
                         tx * ts:(tx + 1) * ts].tobytes(), "checksum": 0}
             for ty in range(n) for tx in range(n)]
    df = spark.createDataFrame(pd.DataFrame(tiles))
    pyr = build_pyramid(df, 1, down_to=0, method="gauss", tile_size=ts)
    got_rows = [r for r in pyr.collect() if r["z"] == 0]
    got = np.frombuffer(got_rows[0]["px"], dtype=np.uint8).reshape(ts, ts)

    g = np.array([1, 2, 1], dtype=np.float64)
    want = np.zeros((ts, ts))
    for j in range(ts):
        for i in range(ts):
            num = den = 0.0
            for m in range(3):
                for nn in range(3):
                    y, x = 2 * j + m, 2 * i + nn
                    if y < n * ts and x < n * ts:
                        w = g[m] * g[nn]
                        num += w * full[y, x]
                        den += w
            want[j, i] = num / den
    want = np.clip(np.floor(want + 0.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_warp_anti_alias_downsample(spark):
    """Scaled general resampler: constant field stays constant for
    every kernel; on a checkerboard the anti-aliased 4:1 downsample
    converges to the mid-grey the unscaled kernel point-samples away
    (the whole point of kernel scaling)."""
    ts = 32
    const = [{"tx": 0, "ty": 0,
              "px": np.full((ts, ts), 55, dtype=np.uint8).tobytes()}]
    checker = np.zeros((ts, ts), dtype=np.uint8)
    checker[::2, ::2] = 200
    checker[1::2, 1::2] = 200          # rows/cols alternate 200/0
    cdf = spark.createDataFrame(pd.DataFrame(const))
    kdf = spark.createDataFrame(pd.DataFrame(
        [{"tx": 0, "ty": 0, "px": checker.tobytes()}]))
    src = TileGrid(0.0, 32.0, 32.0, ts)
    dst = TileGrid(0.0, 32.0, 32.0, 8)     # 4:1 downsample
    for method in ("bilinear", "cubic", "cubicspline", "lanczos"):
        out = warp_tiles(cdf, src, 0, dst, 0, dtype="uint8",
                         src_tile_size=ts, dst_tile_size=8, method=method,
                         anti_alias=True).collect()
        assert (np.frombuffer(out[0]["px"], dtype=np.uint8) == 55).all(), \
            method
    aa = warp_tiles(kdf, src, 0, dst, 0, dtype="uint8", src_tile_size=ts,
                    dst_tile_size=8, method="bilinear",
                    anti_alias=True).collect()
    vals = np.frombuffer(aa[0]["px"], dtype=np.uint8).astype(float)
    assert abs(vals.mean() - 100) < 8      # averaged checkerboard
    assert vals.std() < 15                 # no aliasing stripes


def test_pyramid_multiband_no_cross_band_mixing(spark):
    """Two bands pyramid independently — the grouping key includes
    band, so band canvases never mosaic together."""
    from gdal_spark.operators.raster_tile import build_pyramid

    ts = 8
    t1 = np.full((ts, ts), 10, dtype=np.uint8)
    t2 = np.full((ts, ts), 200, dtype=np.uint8)
    df = spark.createDataFrame(pd.DataFrame([
        {"z": 1, "tx": tx, "ty": ty, "band": b,
         "px": (t1 if b == 1 else t2).tobytes(), "checksum": 0}
        for b in (1, 2) for ty in range(2) for tx in range(2)]))
    for method in ("average", "cubic", "gauss"):
        pyr = build_pyramid(df, 1, down_to=0, method=method,
                            tile_size=ts).collect()
        l0 = {r["band"]: np.frombuffer(r["px"], dtype=np.uint8)
              for r in pyr if r["z"] == 0}
        assert set(l0) == {1, 2}, method
        assert (l0[1] == 10).all() and (l0[2] == 200).all(), method


def test_warp_cutline_masks_outside(spark):
    """gdalwarp -cutline: pixels with centers outside the cutline
    polygon become nodata; inside pixels match the unmasked warp."""
    ts = 16
    tiles = [{"tx": tx, "ty": ty,
              "px": np.full((ts, ts), 77, dtype=np.uint8).tobytes()}
             for ty in range(2) for tx in range(2)]
    df = spark.createDataFrame(pd.DataFrame(tiles))
    g = TileGrid(0.0, 32.0, 32.0, ts)
    cut = [np.array([[8.0, 8.0], [24.0, 8.0], [24.0, 24.0],
                     [8.0, 24.0], [8.0, 8.0]])]
    out = warp_tiles(df, g, 1, g, 1, dtype="uint8", src_tile_size=ts,
                     dst_tile_size=ts, method="near", nodata=0,
                     cutline=cut).collect()
    full = np.zeros((32, 32), dtype=np.uint8)
    for r in out:
        full[r["ty"] * ts:(r["ty"] + 1) * ts,
             r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
            r["px"], dtype=np.uint8).reshape(ts, ts)
    # world y axis points up: row 0 is the TOP (y near 32)
    assert (full[:8, :] == 0).all() and (full[:, :8] == 0).all()
    assert (full[10:22, 10:22] == 77).all()


def test_warp_utm_direction_matches_serial(spark):
    """dst_utm18_src_ll nearest warp == a serial numpy back-projection
    of the assembled raster (tile-split invariance for the new
    direction)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.kernels import geom as kg
    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.warp import warp_tiles

    ts, n = 32, 64
    lon0, lat0, lon1, lat1 = -76.5, 38.5, -75.5, 39.5
    span = (lon1 - lon0) * (1.0 + 1e-9)
    src_grid = TileGrid.local(lon0, lat0, lon1, lat1, tile_size=ts)
    idx = np.arange(n * n).reshape(n, n)
    full = ((idx * 29 + 5) % 256).astype(np.uint8)

    def _mk(key, pdf):
        rows = []
        for ty in range(2):
            for tx in range(2):
                rows.append({"tx": tx, "ty": ty,
                             "px": full[ty*ts:(ty+1)*ts,
                                        tx*ts:(tx+1)*ts].tobytes()})
        return pd.DataFrame(rows)

    tiles = (spark.range(1).withColumn("_g", F.lit(1)).groupBy("_g")
             .applyInPandas(_mk, "tx long, ty long, px binary"))

    bx = np.array([lon0, lon1, lon0, lon1])
    by = np.array([lat0, lat0, lat1, lat1])
    ex, ny_ = kg.tmerc_forward(bx, by, -75.0)
    e0, n0 = float(ex.min()), float(ny_.min())
    dspan = max(float(ex.max()) - e0, float(ny_.max()) - n0) * (1 + 1e-9)
    dst_grid = TileGrid(e0, n0 + dspan, dspan, tile_size=ts)

    out = warp_tiles(tiles, src_grid, 1, dst_grid, 1,
                     direction="dst_utm18_src_ll", dtype="uint8",
                     src_tile_size=ts, dst_tile_size=ts, method="near")
    got = {}
    for r in out.collect():
        t = np.frombuffer(r["px"], dtype=np.uint8).reshape(ts, ts)
        got[(r["tx"], r["ty"])] = t

    # serial reference
    dres = dspan / n
    sres = span / n
    cx = e0 + (np.arange(n) + 0.5) * dres
    cy = (n0 + dspan) - (np.arange(n) + 0.5) * dres
    gx, gy = np.meshgrid(cx, cy)
    lon, lat = kg.tmerc_inverse(gx.ravel(), gy.ravel(), -75.0)
    spx = np.floor((lon - lon0) / sres).astype(np.int64)
    spy = np.floor(((lat0 + span) - lat) / sres).astype(np.int64)
    ok = (spx >= 0) & (spx < n) & (spy >= 0) & (spy < n)
    want = np.zeros(n * n, dtype=np.uint8)
    want[ok] = full[spy[ok], spx[ok]]
    want = want.reshape(n, n)
    for (tx, ty), t in got.items():
        assert (t == want[ty*ts:(ty+1)*ts, tx*ts:(tx+1)*ts]).all(), (tx, ty)
    assert (want > 0).sum() > n * n // 2   # most of the image mapped

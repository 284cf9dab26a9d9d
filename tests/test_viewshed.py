"""Viewshed + LOS: kernel semantics against hand-computable cases,
distributed gather == serial kernel on the assembled mosaic."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gdal_spark.kernels import viewshed as kvs


def test_flat_dem_all_visible():
    dem = np.full((33, 33), 7.0)
    out = kvs.viewshed(dem, 16, 16, observer_z=2.0)
    assert (out == 255).all()


def test_wall_shadows_row():
    """Wall on the observer row: cells behind it are invisible, the
    wall itself is visible; CalcHeightLine growth re-admits nothing
    on flat ground."""
    dem = np.zeros((9, 9))
    dem[4, 6] = 10.0
    out = kvs.viewshed(dem, 4, 4, observer_z=1.0)
    assert out[4, 5] == 255
    assert out[4, 6] == 255          # the wall face is visible
    assert out[4, 7] == 0 and out[4, 8] == 0
    assert out[4, 0:5].tolist() == [255] * 5   # open side unaffected


def test_target_height_recovers_visibility():
    dem = np.zeros((9, 9))
    dem[4, 6] = 10.0
    shadowed = kvs.viewshed(dem, 4, 4, observer_z=1.0)
    towers = kvs.viewshed(dem, 4, 4, observer_z=1.0, target_height=50.0)
    assert shadowed[4, 8] == 0 and towers[4, 8] == 255


def test_wall_shadow_2d_wedge():
    """A wall north of the observer shadows the cells behind it via
    the edge/diagonal reference-plane interpolation."""
    dem = np.zeros((17, 17))
    dem[5, 7:10] = 20.0                        # wall segment above observer
    out = kvs.viewshed(dem, 8, 8, observer_z=1.0)
    assert out[5, 8] == 255                    # wall visible
    assert out[4, 8] == 0 and out[3, 8] == 0   # directly behind: shadow
    assert out[12, 8] == 255                   # opposite side open


def test_cell_modes_run_and_agree_on_flat():
    dem = np.random.RandomState(5).rand(21, 21) * 3
    outs = {m: kvs.viewshed(dem, 10, 10, observer_z=30.0, cell_mode=m)
            for m in ("edge", "diagonal", "min", "max")}
    # edge mode sees everything from a high observer; diagonal (and
    # hence max) legitimately over-occludes — CalcHeightDiagonal
    # divides by (i+j-1) so negative relative heights extrapolate
    # DOWNWARD faster than the true ray (a known property of the
    # Wang-et-al plane approximation)
    assert (outs["edge"] == 255).all()
    assert (outs["min"] == 255).all()
    assert (outs["diagonal"] == 255).mean() > 0.98
    # low observer: modes may differ but min is never more restrictive
    # than max (dfZ_min <= dfZ_max pointwise => visible_min >= visible_max)
    lo = {m: kvs.viewshed(dem, 10, 10, observer_z=0.1, cell_mode=m)
          for m in ("min", "max")}
    assert (lo["min"] >= lo["max"]).all()


def test_los_flat_and_wall():
    dem = np.zeros((16, 16))
    ok, ix, iy = kvs.line_of_sight(dem, 1, 1, 1.0, 12, 9, 2.0)
    assert ok and ix == -1 and iy == -1
    dem2 = dem.copy()
    dem2[5, 6] = 50.0                          # block the diagonal-ish path
    ok2, ix2, iy2 = kvs.line_of_sight(dem2, 1, 1, 1.0, 12, 9, 2.0)
    # blocked somewhere on the walk; intersection is a walk cell
    assert not ok2 and (ix2, iy2) != (-1, -1)


def test_los_endpoint_checks_and_axes():
    dem = np.zeros((8, 8))
    dem[3, 3] = 5.0
    assert kvs.line_of_sight(dem, 3, 3, 4.0, 0, 0, 1.0) == (False, 3, 3)
    assert kvs.line_of_sight(dem, 0, 0, 1.0, 3, 3, 4.0) == (False, 3, 3)
    # horizontal with a mid wall
    dem3 = np.zeros((8, 8))
    dem3[2, 4] = 9.0
    ok, ix, iy = kvs.line_of_sight(dem3, 1, 2, 1.0, 6, 2, 1.0)
    assert (ok, ix, iy) == (False, 4, 2)
    # vertical clear
    assert kvs.line_of_sight(dem3, 1, 0, 1.0, 1, 7, 1.0) == (True, -1, -1)


def _tiles_df(spark, full, ts):
    n = full.shape[0] // ts
    rows = [{"tx": tx, "ty": ty,
             "px": full[ty * ts:(ty + 1) * ts,
                        tx * ts:(tx + 1) * ts].tobytes()}
            for ty in range(n) for tx in range(n)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_distributed_viewshed_matches_serial(spark):
    from gdal_spark.operators.viewshed import viewshed_points

    ts, n = 16, 4
    rng = np.random.RandomState(9)
    full = (rng.rand(n * ts, n * ts) * 12).astype(np.uint8)
    tiles = _tiles_df(spark, full, ts)
    obs = spark.createDataFrame(pd.DataFrame(
        [{"oid": 1, "px": 20, "py": 30}, {"oid": 2, "px": 55, "py": 10}]))
    out = viewshed_points(tiles, obs, tile_size=ts, radius_px=24,
                          observer_z=3.0, raster_w=n * ts,
                          raster_h=n * ts).collect()
    assert len(out) == 2
    for r in out:
        x0, y0, w, h = r["x0"], r["y0"], r["w"], r["h"]
        got = np.frombuffer(r["vis"], dtype=np.uint8).reshape(h, w)
        opx = 20 if r["oid"] == 1 else 55
        opy = 30 if r["oid"] == 1 else 10
        window = full[y0:y0 + h, x0:x0 + w].astype(np.float64)
        want = kvs.viewshed(window, opx - x0, opy - y0, observer_z=3.0)
        np.testing.assert_array_equal(got, want)
        assert r["visible_count"] == int((want != 0).sum())


def test_distributed_los_matches_serial(spark):
    from gdal_spark.operators.viewshed import los_pairs

    ts, n = 16, 4
    rng = np.random.RandomState(13)
    full = (rng.rand(n * ts, n * ts) * 9).astype(np.uint8)
    tiles = _tiles_df(spark, full, ts)
    pairs = [{"pid": k, "xa": (k * 7) % 60, "ya": (k * 11) % 60,
              "za": float(full[(k * 11) % 60, (k * 7) % 60]) + 1.5,
              "xb": (k * 29) % 60, "yb": (k * 17) % 60,
              "zb": float(full[(k * 17) % 60, (k * 29) % 60]) + 2.5}
             for k in range(12)]
    out = {r["pid"]: r for r in los_pairs(
        tiles, spark.createDataFrame(pd.DataFrame(pairs)),
        tile_size=ts).collect()}
    for p in pairs:
        ok, ix, iy = kvs.line_of_sight(
            full.astype(np.float64), p["xa"], p["ya"], p["za"],
            p["xb"], p["yb"], p["zb"])
        r = out[p["pid"]]
        assert (r["visible"], r["ix"], r["iy"]) == (ok, ix, iy), p["pid"]


def test_los_reference_autotest_cases():
    """Transcription of autotest/alg/los.py::test_los_basic on the
    2x1 zero DEM: z above terrain is visible, a below-terrain
    endpoint is not."""
    dem = np.zeros((1, 2))
    assert kvs.line_of_sight(dem, 0, 0, 1.0, 1, 0, 1.0) == (True, -1, -1)
    ok_a, ix_a, iy_a = kvs.line_of_sight(dem, 0, 0, -1.0, 1, 0, 1.0)
    assert (ok_a, ix_a, iy_a) == (False, 0, 0)
    ok_b, ix_b, iy_b = kvs.line_of_sight(dem, 0, 0, 1.0, 1, 0, -1.0)
    assert (ok_b, ix_b, iy_b) == (False, 1, 0)
    # degenerate same-point case
    assert kvs.line_of_sight(dem, 0, 0, 1.0, 0, 0, 1.0) == (True, -1, -1)


def test_los_double_block_reports_second_cell():
    """Bresenham2D quirk (los.cpp:76-87,106): the unconditional
    post-loop test overwrites the intersection with the NEXT cell
    when it is also blocked."""
    dem = np.zeros((5, 5))
    dem[2, 2] = 50.0          # walk cell (2,2)
    dem[2, 3] = 50.0          # next walk cell (3,2)
    ok, ix, iy = kvs.line_of_sight(dem, 0, 0, 1.0, 4, 3, 1.0)
    assert (ok, ix, iy) == (False, 3, 2)
    # single block: the first (and only) blocked cell is reported
    dem2 = np.zeros((5, 5))
    dem2[2, 2] = 50.0
    ok2, ix2, iy2 = kvs.line_of_sight(dem2, 0, 0, 1.0, 4, 3, 1.0)
    assert (ok2, ix2, iy2) == (False, 2, 2)

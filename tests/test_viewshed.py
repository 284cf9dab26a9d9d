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


# ---- curvature + DEM/Ground output modes (round 3) -----------------
# viewshed_executor.cpp: setOutput :179-192 (mode dispatch),
# calcHeightAdjFactor :150-171, adjustHeight curvature branch :268-316.

def _rough_dem(seed=11, h=21, w=27):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w) * 40).round(2) + 5


def test_ground_mode_zero_iff_visible():
    """Ground mode writes max(0, min_visible - cell): exactly the
    cells Normal mode (target_height=0) marks visible get 0."""
    dem = _rough_dem()
    n = kvs.viewshed(dem, 13, 9, observer_z=3.0)
    g = kvs.viewshed(dem, 13, 9, observer_z=3.0, out_mode="ground")
    assert g.dtype == np.float64
    assert ((g == 0) == (n == 255)).all()


def test_dem_mode_is_raw_plus_ground_where_invisible():
    """DEM mode's base is the raw pre-adjustment DEM value
    (processLine :849-850): out = max(0, raw + (min_visible - cell)),
    so wherever ground > 0, dem == raw + ground (non-negative DEM)."""
    dem = _rough_dem(23)
    g = kvs.viewshed(dem, 5, 15, observer_z=2.0, out_mode="ground")
    d = kvs.viewshed(dem, 5, 15, observer_z=2.0, out_mode="dem")
    m = g > 0
    assert m.any()
    np.testing.assert_allclose(d[m], dem[m] + g[m], rtol=0, atol=1e-12)
    assert (d[~m] <= dem[~m] + 1e-12).all()


def test_dem_mode_no_curvature_closed_form():
    """Without curvature, cell_normalized = raw - zobs, so DEM mode =
    max(0, min_visible + zobs) — independent of the cell's own raw
    height wherever the result isn't clamped."""
    dem = _rough_dem(31)
    zobs = float(dem[9, 13]) + 4.0
    d = kvs.viewshed(dem, 13, 9, observer_z=4.0, out_mode="dem")
    g = kvs.viewshed(dem, 13, 9, observer_z=4.0, out_mode="ground")
    # reconstruct min_visible z from ground where it's positive
    m = g > 0
    minvis = g[m] + (dem[m] - zobs)
    np.testing.assert_allclose(d[m], np.maximum(0.0, minvis + zobs),
                               atol=1e-12)


def test_curvature_hides_beyond_horizon_on_flat_dem():
    """Flat DEM, observer 2 m up, 1 km cells: the curved-earth drop
    adj*r^2 (adj = 0.85714 / 2a) exceeds 2 m beyond ~5.5 km, so a
    ring of invisible cells appears while the no-curvature run sees
    everything."""
    flat = np.full((65, 65), 100.0)
    v0 = kvs.viewshed(flat, 32, 32, observer_z=2.0)
    vc = kvs.viewshed(flat, 32, 32, observer_z=2.0, curve_coeff=0.85714,
                      cell_sx=1000.0, cell_sy=1000.0)
    assert (v0 == 255).all()
    assert (vc == 255).sum() < v0.size
    assert (vc[32, 30:35] == 255).all()      # near cells still visible
    # horizon distance sqrt(2*a*h/c) ~ 5.46 km: row through the
    # observer flips from visible to invisible within 1 cell of it
    row = vc[32]
    first_invis = int(np.argmax(row[32:] != 255))
    assert first_invis in (5, 6, 7)


def test_max_distance_masks_out_of_range():
    flat = np.full((33, 33), 50.0)
    out = kvs.viewshed(flat, 16, 16, observer_z=2.0, max_distance=8.0,
                       out_of_range=9)
    yy, xx = np.mgrid[0:33, 0:33]
    r2 = (xx - 16.0) ** 2 + (yy - 16.0) ** 2
    assert (out[r2 > 64.0] == 9).all()
    assert (out[r2 <= 64.0] == 255).all()


def test_edge_fast_path_equals_generic_all_modes():
    """The vectorized edge line must stay bit-identical to the
    sequential transcription under curvature and both height modes."""
    dem = _rough_dem(47, 19, 23)
    for mode in ("normal", "dem", "ground"):
        for cc in (0.0, 0.85714):
            fast = kvs.viewshed(dem, 7, 11, observer_z=3.0, out_mode=mode,
                                curve_coeff=cc, cell_sx=800.0,
                                cell_sy=800.0)
            slow = kvs.viewshed(dem, 7, 11, observer_z=3.0, out_mode=mode,
                                curve_coeff=cc, cell_sx=800.0,
                                cell_sy=800.0, _force_generic=True)
            np.testing.assert_array_equal(fast, slow)


def test_cumulative_viewshed_matches_serial(spark):
    """Distributed fragment rollup == serial sum+scale composition,
    at two tile sizes (tile-split invariance)."""
    import pandas as pd
    from gdal_spark.kernels import viewshed as kvs
    from gdal_spark.operators.viewshed import cumulative_viewshed

    gw = 64
    grid = ((np.arange(gw * gw).reshape(gw, gw) * 7) % 256).astype(np.float64)
    acc = np.zeros((gw, gw), dtype=np.uint32)
    for x in range(0, gw, 16):
        for y in range(0, gw, 16):
            acc += (kvs.viewshed(grid, x, y, observer_z=30.0) != 0) \
                .astype(np.uint32)
    m = int(acc.max())
    exp = np.floor((255.0 / m) * acc).astype(np.uint32) if m else acc

    g8 = grid.astype(np.uint8)
    for ts in (32, 16):
        rows = [{"tx": tx, "ty": ty,
                 "px": g8[ty * ts:(ty + 1) * ts,
                          tx * ts:(tx + 1) * ts].tobytes()}
                for ty in range(gw // ts) for tx in range(gw // ts)]
        tiles = spark.createDataFrame(pd.DataFrame(rows))
        got = cumulative_viewshed(tiles, gw, gw, 16, tile_size=ts,
                                  observer_z=30.0).collect()
        out = np.zeros((gw, gw), dtype=np.uint32)
        for r in got:
            out[r["ty"] * ts:(r["ty"] + 1) * ts,
                r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
                r["px"], dtype=np.uint32).reshape(ts, ts)
        assert np.array_equal(out, exp), f"tile_size={ts}"

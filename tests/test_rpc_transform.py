"""RPC transformer vs a direct scalar transcription of
gdal_rpc.cpp: forward term basis + two-accumulator evaluation
(RPCTransformPoint :358-466), inverse iteration with pre-update
freeze (RPCInverseTransformPoint :1128-1372, no-DEM), affine
inversion (GDALInvGeoTransform, gdaltransformer.cpp:4516-4563)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.rpc_transform import (
    MAX_ITERATIONS, PIX_ERR_THRESHOLD, RPCModel, inv_geotransform,
    pl_to_latlong_geotransform, rpc_forward, rpc_forward_np, rpc_inverse,
    rpc_inverse_np,
)
from gdal_spark.queries.rpc import DEMO_RPC


def _eval_serial(t, c):
    """RPCEvaluate transcription (gdal_rpc.cpp:337-350)."""
    s1 = t[0] * c[0]
    s2 = t[1] * c[1]
    for i in range(2, 20, 2):
        s1 += t[i] * c[i]
        s2 += t[i + 1] * c[i + 1]
    return s1 + s2


def _forward_serial(rpc: RPCModel, lon: float, lat: float, h: float):
    """RPCTransformPoint transcription, scalar Python doubles."""
    diff = lon - rpc.long_off
    if diff < -270:
        diff += 360
    elif diff > 270:
        diff -= 360
    P = diff / rpc.long_scale
    L = (lat - rpc.lat_off) / rpc.lat_scale
    H = (h - rpc.height_off) / rpc.height_scale
    t = [1.0, P, L, H, P * L, P * H, L * H, P * P, L * L, H * H,
         P * L * H, P * P * P, P * L * L, P * H * H, P * P * L,
         L * L * L, L * H * H, P * P * H, L * L * H, H * H * H]
    x = _eval_serial(t, rpc.samp_num) / _eval_serial(t, rpc.samp_den)
    y = _eval_serial(t, rpc.line_num) / _eval_serial(t, rpc.line_den)
    return (x * rpc.samp_scale + rpc.samp_off + 0.5,
            y * rpc.line_scale + rpc.line_off + 0.5)


def _inverse_serial(rpc: RPCModel, px: float, py: float, h: float):
    """RPCInverseTransformPoint transcription (no-DEM): affine init,
    <=10 iterations, freeze pre-update on err < 0.1."""
    i0, i1, i2, i3, i4, i5 = pl_to_latlong_geotransform(rpc)
    X = i0 + i1 * px + i2 * py
    Y = i3 + i4 * px + i5 * py
    for _ in range(MAX_ITERATIONS):
        bx, by = _forward_serial(rpc, X, Y, h)
        dx = bx - px
        dy = by - py
        if max(abs(dx), abs(dy)) < PIX_ERR_THRESHOLD:
            return X, Y, True
        X = X - dx * i1 - dy * i2
        Y = Y - dx * i4 - dy * i5
    return X, Y, False


def _grid():
    pts = []
    for i in range(40):
        lon = DEMO_RPC.long_off + ((i * 37 % 101) - 50) / 50.0 \
            * DEMO_RPC.long_scale * 0.8
        lat = DEMO_RPC.lat_off + ((i * 59 % 89) - 44) / 44.0 \
            * DEMO_RPC.lat_scale * 0.8
        h = DEMO_RPC.height_off + ((i * 13 % 41) - 20) / 20.0 \
            * DEMO_RPC.height_scale * 0.5
        pts.append((i, lon, lat, h))
    return pts


def test_forward_column_bitmatches_serial(spark):
    pts = _grid()
    df = spark.createDataFrame(
        pts, "i long, lon double, lat double, h double")
    got = {r["i"]: (r["px"], r["py"])
           for r in rpc_forward(df, DEMO_RPC, height_col="h").collect()}
    for i, lon, lat, h in pts:
        want = _forward_serial(DEMO_RPC, lon, lat, h)
        assert got[i] == want, i


def test_forward_np_bitmatches_serial():
    pts = _grid()
    px, py = rpc_forward_np(DEMO_RPC,
                            [p[1] for p in pts], [p[2] for p in pts],
                            [p[3] for p in pts])
    for k, (_, lon, lat, h) in enumerate(pts):
        assert (px[k], py[k]) == _forward_serial(DEMO_RPC, lon, lat, h)


def test_dateline_adjustment():
    rpc2 = RPCModel(**{**DEMO_RPC.__dict__, "long_off": 179.0})
    # integer-valued degrees keep the wrapped difference exact:
    # -180 - 179 = -359 -> +360 = 1.0, bit-equal to 180 - 179
    px1, _ = rpc_forward_np(rpc2, -180.0, rpc2.lat_off, 0.0)
    px2, _ = rpc_forward_np(rpc2, 180.0, rpc2.lat_off, 0.0)
    assert px1 == px2


def test_inv_geotransform_paths():
    # no-rotation fast path
    assert inv_geotransform((10.0, 2.0, 0.0, 20.0, 0.0, -4.0)) == \
        (-5.0, 0.5, 0.0, 5.0, 0.0, -0.25)
    # general path: inverse composed with forward is identity
    gt = (3.0, 1.5, 0.2, -7.0, -0.3, 2.5)
    inv = inv_geotransform(gt)
    for x, y in [(0.0, 0.0), (5.0, -3.0), (100.0, 42.0)]:
        gx = gt[0] + gt[1] * x + gt[2] * y
        gy = gt[3] + gt[4] * x + gt[5] * y
        rx = inv[0] + inv[1] * gx + inv[2] * gy
        ry = inv[3] + inv[4] * gx + inv[5] * gy
        assert math.isclose(rx, x, abs_tol=1e-9)
        assert math.isclose(ry, y, abs_tol=1e-9)
    with pytest.raises(ValueError):
        inv_geotransform((0.0, 1.0, 2.0, 0.0, 2.0, 4.0))  # singular


def test_inverse_np_bitmatches_serial_and_roundtrips():
    pts = _grid()
    fpx, fpy = rpc_forward_np(DEMO_RPC,
                              [p[1] for p in pts], [p[2] for p in pts],
                              [p[3] for p in pts])
    X, Y, conv = rpc_inverse_np(DEMO_RPC, fpx, fpy, [p[3] for p in pts])
    assert conv.all()
    for k, (_, lon, lat, h) in enumerate(pts):
        sx, sy, sc = _inverse_serial(DEMO_RPC, fpx[k], fpy[k], h)
        assert sc
        assert (X[k], Y[k]) == (sx, sy), k
        # roundtrip error bounded by the pixel threshold mapped
        # through the affine (the guarantee the reference gives)
        bpx, bpy = rpc_forward_np(DEMO_RPC, X[k], Y[k], h)
        assert abs(bpx - fpx[k]) < PIX_ERR_THRESHOLD
        assert abs(bpy - fpy[k]) < PIX_ERR_THRESHOLD


def test_inverse_dataframe_and_nonconvergence(spark):
    pts = _grid()[:10]
    fpx, fpy = rpc_forward_np(DEMO_RPC,
                              [p[1] for p in pts], [p[2] for p in pts],
                              [p[3] for p in pts])
    df = spark.createDataFrame(
        [(p[0], float(fpx[k]), float(fpy[k]), p[3])
         for k, p in enumerate(pts)],
        "i long, px double, py double, h double")
    out = {r["i"]: r for r in
           rpc_inverse(df, DEMO_RPC, height_col="h").collect()}
    for k, (i, lon, lat, h) in enumerate(pts):
        sx, sy, _ = _inverse_serial(DEMO_RPC, fpx[k], fpy[k], h)
        assert out[i]["converged"]
        assert (out[i]["lon"], out[i]["lat"]) == (sx, sy)
    # starving the iteration budget must yield NULLs, not garbage
    out1 = rpc_inverse(df, DEMO_RPC, height_col="h",
                       max_iterations=0).collect()
    assert all((not r["converged"]) and r["lon"] is None for r in out1)

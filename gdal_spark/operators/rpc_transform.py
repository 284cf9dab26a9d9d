"""RPC (rational polynomial coefficient) georeferencing — the
`gdalwarp -rpc` transformer of the GenImgProj chain.

Reference: /root/reference/alg/gdal_rpc.cpp (no-DEM branch; the DEM
height lookup is an orthogonal raster join this engine already has
as point_sample):

* forward lonlat->pixel/line (RPCTransformPoint, :358-466):
  dateline-adjusted normalized (P, L, H), the 20-term cubic basis
  (RPCComputeTerms, :192-215), each rational evaluated as
  num/den with RPCEvaluate's two-accumulator summation
  (:337-350 — sum1 over even term slots, sum2 over odd, result
  sum1+sum2; mirrored exactly so doubles bit-match), then
  `x*SCALE + OFF + 0.5` (center-of-pixel -> GDAL corner
  convention, :460-466);
* inverse pixel/line->lonlat (RPCInverseTransformPoint,
  :1128-1372): initial guess through the inverse of an affine
  approximation established by finite differences at a reference
  point (transformer creation, :995-1090; dfLLDelta = 1e-4),
  then up to 10 iterations (no-DEM default, :1189-1191) of
  forward-project / error / affine correction; convergence when
  max(|dpx|, |dpy|) < 0.1 px (DEFAULT_PIX_ERR_THRESHOLD, :63),
  keeping the PRE-update guess, exactly like the reference's
  `break`.  The DEM-only oscillation/boost branches (:1295-1332,
  both gated on `poDS != nullptr`) do not apply;
* the affine inverse follows GDALInvGeoTransform
  (alg/gdaltransformer.cpp:4516-4563) including the
  rotation-free fast path.

Spark-first split: transformer creation (reference point, affine
fit, its inversion) is a bounded driver-side step — O(1) work, as
in the reference.  The forward transform is pure Column
arithmetic (whole-stage codegen, no shuffle, no Python).  The
inverse is iterative per row, so it runs as an Arrow-batched
pandas UDF: one numpy batch holds every point's iteration state,
converged rows freeze (mask update), 10 vectorized rounds max —
per-row Python never runs.  Both directions scale linearly and
pipeline with the parquet scan at any corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

#: (i, j, k) exponents of P^i * L^j * H^k per term slot 0-19
#: (RPCComputeTerms, gdal_rpc.cpp:192-215; P=long, L=lat, H=height)
RPC_TERM_EXP: tuple[tuple[int, int, int], ...] = (
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1),
    (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 1), (3, 0, 0), (1, 2, 0), (1, 0, 2), (2, 1, 0),
    (0, 3, 0), (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
)

PIX_ERR_THRESHOLD = 0.1        # DEFAULT_PIX_ERR_THRESHOLD, gdal_rpc.cpp:63
MAX_ITERATIONS = 10            # no-DEM default, gdal_rpc.cpp:1189-1191
LL_DELTA = 0.0001              # dfLLDelta, gdal_rpc.cpp:1063


@dataclass(frozen=True)
class RPCModel:
    """The GDALRPCInfoV2 coefficient block (gdal_rpc.cpp usage)."""
    long_off: float
    long_scale: float
    lat_off: float
    lat_scale: float
    height_off: float
    height_scale: float
    samp_off: float
    samp_scale: float
    line_off: float
    line_scale: float
    samp_num: tuple[float, ...]
    samp_den: tuple[float, ...]
    line_num: tuple[float, ...]
    line_den: tuple[float, ...]
    min_long: float = -180.0
    max_long: float = 180.0
    min_lat: float = -90.0
    max_lat: float = 90.0

    def __post_init__(self):
        for c in (self.samp_num, self.samp_den, self.line_num, self.line_den):
            if len(c) != 20:
                raise ValueError("RPC coefficient arrays must have 20 terms")


# ---------------------------------------------------------------- forward

def _terms_np(P, L, H):
    """20-term basis, products in RPCComputeTerms' literal order
    (left-assoc, e.g. t10 = (P*L)*H) so doubles match the serial C."""
    return [
        np.ones_like(P), P, L, H,
        P * L, P * H, L * H,
        P * P, L * L, H * H,
        P * L * H, P * P * P, P * L * L, P * H * H, P * P * L,
        L * L * L, L * H * H, P * P * H, L * L * H, H * H * H,
    ]


def _evaluate_np(terms, coefs):
    """RPCEvaluate (gdal_rpc.cpp:337-350): two interleaved
    accumulators summed in slot order, then added — reproduced term
    by term (numpy pairwise-summation reductions would change the
    rounding)."""
    s1 = terms[0] * coefs[0]
    s2 = terms[1] * coefs[1]
    for i in range(2, 20, 2):
        s1 = s1 + terms[i] * coefs[i]
        s2 = s2 + terms[i + 1] * coefs[i + 1]
    return s1 + s2


def rpc_forward_np(rpc: RPCModel, lon, lat, height):
    """Vectorized forward transform (RPCTransformPoint,
    gdal_rpc.cpp:358-466) — also the scalar path used at
    transformer creation."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    height = np.asarray(height, dtype=np.float64)
    diff = lon - rpc.long_off
    diff = np.where(diff < -270, diff + 360, diff)
    diff = np.where(diff > 270, diff - 360, diff)
    P = diff / rpc.long_scale
    L = (lat - rpc.lat_off) / rpc.lat_scale
    H = (height - rpc.height_off) / rpc.height_scale
    t = _terms_np(P, L, H)
    x = _evaluate_np(t, rpc.samp_num) / _evaluate_np(t, rpc.samp_den)
    y = _evaluate_np(t, rpc.line_num) / _evaluate_np(t, rpc.line_den)
    return (x * rpc.samp_scale + rpc.samp_off + 0.5,
            y * rpc.line_scale + rpc.line_off + 0.5)


def _terms_cols(P: Column, L: Column, H: Column) -> list[Column]:
    return [
        F.lit(1.0), P, L, H,
        P * L, P * H, L * H,
        P * P, L * L, H * H,
        P * L * H, P * P * P, P * L * L, P * H * H, P * P * L,
        L * L * L, L * H * H, P * P * H, L * L * H, H * H * H,
    ]


def _evaluate_col(terms: list[Column], coefs) -> Column:
    s1 = terms[0] * F.lit(float(coefs[0]))
    s2 = terms[1] * F.lit(float(coefs[1]))
    for i in range(2, 20, 2):
        s1 = s1 + terms[i] * F.lit(float(coefs[i]))
        s2 = s2 + terms[i + 1] * F.lit(float(coefs[i + 1]))
    return s1 + s2


def rpc_forward_cols(rpc: RPCModel, lon: Column, lat: Column,
                     height: Column | None = None
                     ) -> tuple[Column, Column]:
    """Forward transform as pure Column arithmetic — the same
    expression shape as rpc_forward_np, JVM codegen end to end."""
    h = height if height is not None else F.lit(0.0)
    diff = lon.cast("double") - F.lit(rpc.long_off)
    diff = F.when(diff < -270, diff + 360) \
        .when(diff > 270, diff - 360).otherwise(diff)
    P = diff / F.lit(rpc.long_scale)
    L = (lat.cast("double") - F.lit(rpc.lat_off)) / F.lit(rpc.lat_scale)
    H = (h.cast("double") - F.lit(rpc.height_off)) / F.lit(rpc.height_scale)
    t = _terms_cols(P, L, H)
    x = _evaluate_col(t, rpc.samp_num) / _evaluate_col(t, rpc.samp_den)
    y = _evaluate_col(t, rpc.line_num) / _evaluate_col(t, rpc.line_den)
    return (x * F.lit(rpc.samp_scale) + F.lit(rpc.samp_off) + F.lit(0.5),
            y * F.lit(rpc.line_scale) + F.lit(rpc.line_off) + F.lit(0.5))


def rpc_forward(df: DataFrame, rpc: RPCModel,
                lon_col: str = "lon", lat_col: str = "lat",
                height_col: str | None = None,
                out_px: str = "px", out_py: str = "py") -> DataFrame:
    """lonlat -> pixel/line over every row: map-only, codegen'd."""
    h = F.col(height_col) if height_col else None
    px, py = rpc_forward_cols(rpc, F.col(lon_col), F.col(lat_col), h)
    return df.withColumn(out_px, px).withColumn(out_py, py)


# ---------------------------------------------------------------- inverse

def inv_geotransform(gt: tuple) -> tuple:
    """GDALInvGeoTransform (alg/gdaltransformer.cpp:4516-4563),
    including the no-rotation fast path and the degenerate-det
    guard."""
    g0, g1, g2, g3, g4, g5 = (float(v) for v in gt)
    if g2 == 0.0 and g4 == 0.0 and g1 != 0.0 and g5 != 0.0:
        return (-g0 / g1, 1.0 / g1, 0.0, -g3 / g5, 0.0, 1.0 / g5)
    det = g1 * g5 - g2 * g4
    mag = max(abs(g1), abs(g2), abs(g4), abs(g5))
    if abs(det) <= 1e-10 * mag * mag:
        raise ValueError("non-invertible RPC reference affine")
    inv_det = 1.0 / det
    return ((g2 * g3 - g0 * g5) * inv_det, g5 * inv_det, -g2 * inv_det,
            (-g1 * g3 + g0 * g4) * inv_det, -g4 * inv_det, g1 * inv_det)


def pl_to_latlong_geotransform(rpc: RPCModel, ref_z: float = 0.0) -> tuple:
    """The inverse affine approximation established at transformer
    creation (gdal_rpc.cpp:995-1090): reference point from the
    lat/long bounds midpoint when real bounds exist, else the
    offsets (:1004-1033, with the same "daft result" fallback);
    direction vectors by +-1e-4 deg finite differences; inverted by
    GDALInvGeoTransform."""
    if rpc.min_long != -180.0 or rpc.max_long != 180.0:
        ref_long = (rpc.min_long + rpc.max_long) * 0.5
        ref_lat = (rpc.min_lat + rpc.max_lat) * 0.5
    else:
        ref_long = rpc.long_off
        ref_lat = rpc.lat_off
    ref_px, ref_py = rpc_forward_np(rpc, ref_long, ref_lat, 0.0)
    if ref_px < 0.0 or ref_py < 0.0 or ref_px > 100000 or ref_py > 100000:
        ref_long, ref_lat = rpc.long_off, rpc.lat_off
        ref_px, ref_py = rpc_forward_np(rpc, ref_long, ref_lat, 0.0)

    dx_px, dx_py = rpc_forward_np(rpc, ref_long + LL_DELTA, ref_lat, ref_z)
    dy_px, dy_py = rpc_forward_np(rpc, ref_long, ref_lat + LL_DELTA, ref_z)
    g1 = (dx_px - ref_px) / LL_DELTA
    g4 = (dx_py - ref_py) / LL_DELTA
    g2 = (dy_px - ref_px) / LL_DELTA
    g5 = (dy_py - ref_py) / LL_DELTA
    g0 = ref_px - g1 * ref_long - g2 * ref_lat
    g3 = ref_py - g4 * ref_long - g5 * ref_lat
    return inv_geotransform((g0, g1, g2, g3, g4, g5))


def rpc_inverse_np(rpc: RPCModel, px, py, height,
                   inv_gt: tuple | None = None,
                   max_iterations: int = MAX_ITERATIONS,
                   pix_err_threshold: float = PIX_ERR_THRESHOLD):
    """Vectorized RPCInverseTransformPoint (gdal_rpc.cpp:1128-1372,
    no-DEM branch): every point iterates in one numpy state array;
    converged rows freeze at their pre-update guess (the reference's
    `break`).  Returns (lon, lat, converged)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    height = np.broadcast_to(
        np.asarray(height, dtype=np.float64), px.shape).copy()
    inv_gt = inv_gt if inv_gt is not None else pl_to_latlong_geotransform(rpc)
    i0, i1, i2, i3, i4, i5 = inv_gt
    X = i0 + i1 * px + i2 * py
    Y = i3 + i4 * px + i5 * py
    conv = np.zeros(px.shape, dtype=bool)
    for _ in range(max_iterations):
        act = ~conv
        if not act.any():
            break
        bx, by = rpc_forward_np(rpc, X[act], Y[act], height[act])
        dx = bx - px[act]
        dy = by - py[act]
        err = np.maximum(np.abs(dx), np.abs(dy))
        ok = err < pix_err_threshold
        idx = np.flatnonzero(act)
        conv[idx[ok]] = True
        upd = idx[~ok]
        X[upd] = X[upd] - dx[~ok] * i1 - dy[~ok] * i2
        Y[upd] = Y[upd] - dx[~ok] * i4 - dy[~ok] * i5
    return X, Y, conv


def rpc_inverse(df: DataFrame, rpc: RPCModel,
                px_col: str = "px", py_col: str = "py",
                height_col: str | None = None,
                out_lon: str = "lon", out_lat: str = "lat",
                out_conv: str = "converged",
                max_iterations: int = MAX_ITERATIONS) -> DataFrame:
    """pixel/line -> lonlat over every row.  Arrow-batched pandas
    UDF: the iteration state lives in numpy arrays per batch, rows
    that converge are masked out of later rounds — at most
    ``max_iterations`` vectorized passes per batch, no per-row
    Python.  Non-converged rows (the reference returns FALSE) carry
    NULL coordinates and converged = false."""
    inv_gt = pl_to_latlong_geotransform(rpc)

    @F.pandas_udf("struct<lon:double, lat:double, converged:boolean>")
    def _inv(px: pd.Series, py: pd.Series, h: pd.Series) -> pd.DataFrame:
        X, Y, conv = rpc_inverse_np(
            rpc, px.to_numpy(np.float64), py.to_numpy(np.float64),
            h.to_numpy(np.float64), inv_gt, max_iterations)
        return pd.DataFrame({
            "lon": np.where(conv, X, np.nan),
            "lat": np.where(conv, Y, np.nan),
            "converged": conv,
        })

    h = F.col(height_col).cast("double") if height_col else F.lit(0.0)
    out = df.withColumn(
        "_rpc", _inv(F.col(px_col).cast("double"),
                     F.col(py_col).cast("double"), h))
    return (out
            .withColumn(out_lon, F.when(F.col("_rpc.converged"),
                                        F.col("_rpc.lon")))
            .withColumn(out_lat, F.when(F.col("_rpc.converged"),
                                        F.col("_rpc.lat")))
            .withColumn(out_conv, F.col("_rpc.converged"))
            .drop("_rpc"))

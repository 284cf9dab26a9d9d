"""Thin-plate-spline georeferencing — the `gdalwarp -tps` transformer.

Reference: /root/reference/alg/thinplatespline.cpp (VizGeorefSpline2D,
used by GDALCreateTPSTransformer in alg/gdal_tps.cpp):

* radial basis U(p, q) = d2 * ln(d2) with d2 the SQUARED distance,
  and U = 0 at d2 == 0 (VizGeorefSpline2DBase_func, :172-180);
* the full system (type VIZ_GEOREF_SPLINE_FULL, solve() :536-608):
  GCP source coordinates are mean-centered (:549-561), the
  (n+3)x(n+3) symmetric matrix carries the affine side conditions in
  rows/cols 0-2 (:563-570) and U(r, c) in the point block
  (:572-579), one RHS column per target variable;
* evaluation (get_point FULL case, :666-690):
  f(P) = c0 + c1*(Px - x_mean) + c2*(Py - y_mean)
       + sum_r coef[r+3] * U(P - GCP_r).

Only the FULL (>= 3 non-degenerate points) case is implemented; the
reference's 1-point/2-point/collinear fallbacks (:432-533) raise
instead — a TPS warp over degenerate GCPs is a misconfiguration at
any scale.

Spark-first split, same shape as gcp_transform.py: the FIT is one
bounded driver-side solve over the GCP list (the reference solves
once at transformer creation; GCP counts are O(10^2-10^3)).  The
TRANSFORM is pure Column arithmetic for small GCP counts — each GCP
contributes one `d2 * ln(d2)` term to a whole-stage-codegen'd
expression — and an Arrow-batched pandas path past
``COLUMN_PATH_MAX_GCPS`` where the expression tree would outgrow
codegen: there the per-batch cost is one (batch x n_gcps) numpy
distance matrix, still zero shuffle and linear in rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

#: above this GCP count the Column expression tree is traded for the
#: vectorized pandas evaluator.  Measured limit, not taste: a single
#: nested Add tree cannot be split by CodegenContext, and consumers
#: that reference the output twice (filter on both coords + agg)
#: push a 24-GCP tree past janino's 64 KB method limit (silent
#: interpreted fallback — correct but row-at-a-time).  16 GCPs
#: compiled in every duplication-heavy shape tried.
COLUMN_PATH_MAX_GCPS = 16


@dataclass(frozen=True)
class TPSSpline:
    """One fitted TPS direction: mean-centered GCP sources + the
    (n+3) coefficients per output variable, reference layout
    (coef[0..2] affine, coef[3+r] the RBF weight of GCP r)."""
    x_mean: float
    y_mean: float
    xs: tuple[float, ...]       # centered GCP source x
    ys: tuple[float, ...]       # centered GCP source y
    coef_x: tuple[float, ...]
    coef_y: tuple[float, ...]


def _base(d2: np.ndarray) -> np.ndarray:
    """U = d2 * ln(d2), 0 at 0 (VizGeorefSpline2DBase_func)."""
    out = np.zeros_like(d2)
    nz = d2 != 0.0
    out[nz] = d2[nz] * np.log(d2[nz])
    return out


def fit_tps(src_x, src_y, dst_x, dst_y) -> TPSSpline:
    """Solve the full TPS system (thinplatespline.cpp solve()
    :536-608): mean-center sources, assemble the bordered RBF
    matrix, one linear solve for both target variables."""
    sx = np.asarray(src_x, dtype=np.float64)
    sy = np.asarray(src_y, dtype=np.float64)
    dx = np.asarray(dst_x, dtype=np.float64)
    dy = np.asarray(dst_y, dtype=np.float64)
    n = sx.size
    if n < 3:
        raise ValueError("TPS full case needs >= 3 GCPs "
                         "(reference 1/2-point fallbacks not supported)")

    ssxx = np.sum(sx * sx) - sx.sum() ** 2 / n
    ssyy = np.sum(sy * sy) - sy.sum() ** 2 / n
    ssxy = np.sum(sx * sy) - sx.sum() * sy.sum() / n
    delx = sx.max() - sx.min()
    dely = sy.max() - sy.min()
    if ssxx * ssyy == 0.0 or delx < 0.001 * dely or dely < 0.001 * delx \
            or abs(ssxy * ssxy / (ssxx * ssyy)) > 0.99:
        raise ValueError("degenerate / collinear GCPs "
                         "(reference ONE_DIMENSIONAL fallback not supported)")

    x_mean = float(sx.mean())
    y_mean = float(sy.mean())
    cx = sx - x_mean
    cy = sy - y_mean

    a = np.zeros((n + 3, n + 3), dtype=np.float64)
    a[0, 3:] = 1.0
    a[1, 3:] = cx
    a[2, 3:] = cy
    a[3:, 0] = 1.0
    a[3:, 1] = cx
    a[3:, 2] = cy
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    a[3:, 3:] = _base(d2)

    rhs = np.zeros((n + 3, 2), dtype=np.float64)
    rhs[3:, 0] = dx
    rhs[3:, 1] = dy
    coef = np.linalg.solve(a, rhs)
    return TPSSpline(
        x_mean=x_mean, y_mean=y_mean,
        xs=tuple(float(v) for v in cx), ys=tuple(float(v) for v in cy),
        coef_x=tuple(float(v) for v in coef[:, 0]),
        coef_y=tuple(float(v) for v in coef[:, 1]),
    )


def tps_transform_cols(spline: TPSSpline, px: Column, py: Column
                       ) -> tuple[Column, Column]:
    """get_point FULL case (:666-690) as Column arithmetic: affine
    part + one U-term per GCP, all inside whole-stage codegen."""
    dxc = px.cast("double") - F.lit(spline.x_mean)
    dyc = py.cast("double") - F.lit(spline.y_mean)
    out_x = (F.lit(spline.coef_x[0]) + F.lit(spline.coef_x[1]) * dxc
             + F.lit(spline.coef_x[2]) * dyc)
    out_y = (F.lit(spline.coef_y[0]) + F.lit(spline.coef_y[1]) * dxc
             + F.lit(spline.coef_y[2]) * dyc)
    for r, (gx, gy) in enumerate(zip(spline.xs, spline.ys)):
        d2 = (dxc - F.lit(gx)) * (dxc - F.lit(gx)) \
            + (dyc - F.lit(gy)) * (dyc - F.lit(gy))
        u = F.when(d2 == 0.0, F.lit(0.0)).otherwise(d2 * F.log(d2))
        out_x = out_x + F.lit(spline.coef_x[r + 3]) * u
        out_y = out_y + F.lit(spline.coef_y[r + 3]) * u
    return out_x, out_y


def _tps_eval_np(spline: TPSSpline, px: np.ndarray, py: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized serial evaluator (also the pandas-UDF body)."""
    dxc = px - spline.x_mean
    dyc = py - spline.y_mean
    gx = np.asarray(spline.xs)
    gy = np.asarray(spline.ys)
    d2 = (dxc[:, None] - gx[None, :]) ** 2 + (dyc[:, None] - gy[None, :]) ** 2
    u = _base(d2)
    wx = np.asarray(spline.coef_x[3:])
    wy = np.asarray(spline.coef_y[3:])
    ox = spline.coef_x[0] + spline.coef_x[1] * dxc \
        + spline.coef_x[2] * dyc + u @ wx
    oy = spline.coef_y[0] + spline.coef_y[1] * dxc \
        + spline.coef_y[2] * dyc + u @ wy
    return ox, oy


def tps_transform(df: DataFrame, spline: TPSSpline,
                  px_col: str = "px", py_col: str = "py",
                  out_x: str = "geo_x", out_y: str = "geo_y") -> DataFrame:
    """Apply a fitted TPS to every row (GDALTPSTransform role).

    <= COLUMN_PATH_MAX_GCPS: pure projection, codegen'd, no Python.
    Beyond: Arrow-batched pandas UDF over the same numpy evaluator —
    still a narrow map, no shuffle."""
    if len(spline.xs) <= COLUMN_PATH_MAX_GCPS:
        cx, cy = tps_transform_cols(spline, F.col(px_col), F.col(py_col))
        return df.withColumn(out_x, cx).withColumn(out_y, cy)

    @F.pandas_udf("struct<x: double, y: double>")
    def _apply(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        ox, oy = _tps_eval_np(spline, xs.to_numpy(np.float64),
                              ys.to_numpy(np.float64))
        return pd.DataFrame({"x": ox, "y": oy})

    tmp = df.withColumn("_tps", _apply(F.col(px_col), F.col(py_col)))
    return (tmp.withColumn(out_x, F.col("_tps.x"))
            .withColumn(out_y, F.col("_tps.y")).drop("_tps"))


def fit_tps_df(gcps: DataFrame,
               cols: tuple[str, str, str, str] = ("px", "py", "gx", "gy")
               ) -> TPSSpline:
    """Fit from a (small) GCP DataFrame — ONE bounded driver action,
    ordered collection so the fit is partitioning-independent."""
    rows = gcps.select(*cols).orderBy(cols[0], cols[1]).collect()
    return fit_tps([r[0] for r in rows], [r[1] for r in rows],
                   [r[2] for r in rows], [r[3] for r in rows])

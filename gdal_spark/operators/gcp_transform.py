"""GCP polynomial georeferencing — the `gdalwarp -order N` transformer.

Reference: /root/reference/alg/gdal_crs.cpp (the GRASS-derived CRS
polynomial transformer behind GDALCreateGCPTransformer):

* term basis per order (gdal_crs.cpp term table, calcls comment):
  order 1 -> [1, e, n]; order 2 -> + [e2, en, n2];
  order 3 -> + [e3, e2n, en2, n3] — exactly CRS_georef's coefficient
  order (gdal_crs.cpp:632-664);
* source coordinates are mean-centered before fitting and evaluation
  (GDALCreateGCPTransformerEx, gdal_crs.cpp:286-289; applied at
  transform time at :451,457);
* with exactly (order+1)(order+2)/2 GCPs the square system is solved
  directly (exactdet, :795); with more, the normal equations of the
  least-squares system are formed (calcls, :843-870) — both solved by
  Gauss-Jordan elimination with partial pivoting (solvemat, :930-999);
* both directions are fitted: pixel->geo (E12/N12) and geo->pixel
  (E21/N21) by swapping the point roles
  (CRS_compute_georef_equations, :680-700).

Spark-first split: the FIT is a bounded driver-side step over the GCP
list (the reference computes coefficients once at transformer
creation; GCP lists are O(10^2-10^4) — collecting them is not a
driver-side loop over data).  The TRANSFORM is pure Column
arithmetic in CRS_georef's exact expression shape: whole-stage
codegen, no shuffle, no Python — it scales linearly over any number
of rows and composes with warp/tile operators as the GenImgProj
chain does.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

#: exponent pairs (i, j) of e^i * n^j per term slot, the reference's
#: term() table (gdal_crs.cpp calcls comment block)
TERM_EXPONENTS: tuple[tuple[int, int], ...] = (
    (0, 0), (1, 0), (0, 1),            # order 1
    (2, 0), (1, 1), (0, 2),            # order 2
    (3, 0), (2, 1), (1, 2), (0, 3),    # order 3
)


def n_terms(order: int) -> int:
    """(order+1)(order+2)/2 — minimum GCP count (calccoef, :751)."""
    return (order + 1) * (order + 2) // 2


@dataclass(frozen=True)
class GCPPolynomial:
    """One fitted direction: CRS_georef coefficients + the source-side
    means removed before evaluation."""
    order: int
    x_mean: float
    y_mean: float
    coef_x: tuple[float, ...]   # E[] easting coefficients
    coef_y: tuple[float, ...]   # N[] northing coefficients


def _solvemat(m: np.ndarray, a: np.ndarray, b: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Jordan with partial pivoting, solvemat parity
    (gdal_crs.cpp:930-999): for each column pick the
    largest-magnitude pivot below, swap, eliminate every OTHER row,
    finally divide the column vectors by the diagonal."""
    m = m.astype(np.float64).copy()
    a = a.astype(np.float64).copy()
    b = b.astype(np.float64).copy()
    nn = m.shape[0]
    for i in range(nn):
        imark = i + int(np.argmax(np.abs(m[i:, i])))
        if m[imark, i] == 0.0:
            raise ValueError("GCPs are (nearly) co-linear: unsolvable")
        if imark != i:
            m[[i, imark]] = m[[imark, i]]
            a[[i, imark]] = a[[imark, i]]
            b[[i, imark]] = b[[imark, i]]
        for i2 in range(nn):
            if i2 != i:
                factor = m[i2, i] / m[i, i]
                m[i2, i:] -= factor * m[i, i:]
                a[i2] -= factor * a[i]
                b[i2] -= factor * b[i]
    return a / np.diag(m), b / np.diag(m)


def fit_gcp_polynomial(src_x, src_y, dst_x, dst_y,
                       order: int = 1) -> GCPPolynomial:
    """Fit one direction src->dst (calccoef, gdal_crs.cpp:728-788).

    Exactly n_terms(order) GCPs solve the square system (exactdet);
    more form the least-squares normal equations (calcls).  Fewer
    raise, like MNPTERR."""
    if not 1 <= order <= 3:
        raise ValueError("polynomial order must be 1, 2 or 3")
    sx = np.asarray(src_x, dtype=np.float64)
    sy = np.asarray(src_y, dtype=np.float64)
    dx = np.asarray(dst_x, dtype=np.float64)
    dy = np.asarray(dst_y, dtype=np.float64)
    nt = n_terms(order)
    if len(sx) < nt:
        raise ValueError(f"order {order} needs >= {nt} GCPs, got {len(sx)}")
    x_mean = float(sx.sum() / len(sx))
    y_mean = float(sy.sum() / len(sy))
    e = sx - x_mean
    n_ = sy - y_mean
    design = np.stack([e ** i * n_ ** j
                       for i, j in TERM_EXPONENTS[:nt]], axis=1)
    if len(sx) == nt:
        m, a, b = design, dx, dy
    else:
        m = design.T @ design
        a = design.T @ dx
        b = design.T @ dy
    coef_x, coef_y = _solvemat(m, a, b)
    return GCPPolynomial(order, x_mean, y_mean,
                         tuple(coef_x.tolist()), tuple(coef_y.tolist()))


def fit_gcp_transformer(src_x, src_y, dst_x, dst_y, order: int = 1
                        ) -> tuple[GCPPolynomial, GCPPolynomial]:
    """(forward, inverse) pair — CRS_compute_georef_equations fits
    E12/N12 then swaps the arrays for E21/N21 (gdal_crs.cpp:680-700).
    The inverse of a higher-order polynomial is itself only a
    polynomial FIT, approximate away from the GCPs, exactly as in
    the reference."""
    fwd = fit_gcp_polynomial(src_x, src_y, dst_x, dst_y, order)
    inv = fit_gcp_polynomial(dst_x, dst_y, src_x, src_y, order)
    return fwd, inv


def gcp_transform_cols(poly: GCPPolynomial, px: Column, py: Column
                       ) -> tuple[Column, Column]:
    """CRS_georef (gdal_crs.cpp:612-664) as Column arithmetic with
    the reference's exact product/sum shape, so results bit-match a
    serial evaluation of the same coefficients."""
    E = [F.lit(float(c)) for c in poly.coef_x]
    N = [F.lit(float(c)) for c in poly.coef_y]
    e1 = px.cast("double") - F.lit(poly.x_mean)
    n1 = py.cast("double") - F.lit(poly.y_mean)
    if poly.order == 1:
        return (E[0] + E[1] * e1 + E[2] * n1,
                N[0] + N[1] * e1 + N[2] * n1)
    e2 = e1 * e1
    en = e1 * n1
    n2 = n1 * n1
    if poly.order == 2:
        return (E[0] + E[1] * e1 + E[2] * n1 + E[3] * e2 + E[4] * en
                + E[5] * n2,
                N[0] + N[1] * e1 + N[2] * n1 + N[3] * e2 + N[4] * en
                + N[5] * n2)
    e3 = e1 * e2
    e2n = e2 * n1
    en2 = e1 * n2
    n3 = n1 * n2
    return (E[0] + E[1] * e1 + E[2] * n1 + E[3] * e2 + E[4] * en
            + E[5] * n2 + E[6] * e3 + E[7] * e2n + E[8] * en2 + E[9] * n3,
            N[0] + N[1] * e1 + N[2] * n1 + N[3] * e2 + N[4] * en
            + N[5] * n2 + N[6] * e3 + N[7] * e2n + N[8] * en2 + N[9] * n3)


def gcp_transform(df: DataFrame, poly: GCPPolynomial,
                  px_col: str = "px", py_col: str = "py",
                  out_x: str = "geo_x", out_y: str = "geo_y") -> DataFrame:
    """Apply a fitted polynomial to every row (GDALGCPTransform role,
    gdal_crs.cpp:430-470).  Pure projection: no shuffle, codegen'd."""
    gx, gy = gcp_transform_cols(poly, F.col(px_col), F.col(py_col))
    return df.withColumn(out_x, gx).withColumn(out_y, gy)


def fit_gcp_transformer_df(gcps: DataFrame, order: int = 1,
                           cols: tuple[str, str, str, str] =
                           ("px", "py", "gx", "gy")
                           ) -> tuple[GCPPolynomial, GCPPolynomial]:
    """Fit from a (small) GCP DataFrame — ONE bounded driver action,
    mirroring transformer creation in the reference.  Collection is
    ordered by the first column so the fit is deterministic
    regardless of partitioning."""
    rows = (gcps.select(*cols).orderBy(cols[0], cols[1]).collect())
    sx = [r[0] for r in rows]
    sy = [r[1] for r in rows]
    dx = [r[2] for r in rows]
    dy = [r[3] for r in rows]
    return fit_gcp_transformer(sx, sy, dx, dy, order)

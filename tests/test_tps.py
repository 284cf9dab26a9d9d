"""Thin-plate-spline transformer tests (thinplatespline.cpp parity).

Evidence strategy: the solver is checked against the MATHEMATICAL
definition of the interpolant, not a serial twin — (a) exact
interpolation at every GCP, (b) side conditions on the recovered
RBF weights, (c) exact recovery of a generating function that lies
in the spline's span (unique-interpolant argument, see
queries/tps.py), (d) Column path == pandas path bit-for-bit on the
same spline.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.tps_transform import (
    COLUMN_PATH_MAX_GCPS, TPSSpline, _tps_eval_np, fit_tps, tps_transform,
)

RNG = np.random.default_rng(7)


def _random_gcps(n):
    # distinct random sources, smooth-ish random targets
    sx = RNG.permutation(200)[:n].astype(float)
    sy = RNG.permutation(200)[:n].astype(float)
    dx = 2.0 * sx - sy + RNG.normal(0, 5, n)
    dy = sx + 3.0 * sy + RNG.normal(0, 5, n)
    return sx, sy, dx, dy


@pytest.mark.parametrize("n", [3, 10, 80])
def test_interpolates_every_gcp(n):
    sx, sy, dx, dy = _random_gcps(n)
    spl = fit_tps(sx, sy, dx, dy)
    fx, fy = _tps_eval_np(spl, sx, sy)
    assert np.abs(fx - dx).max() < 1e-7
    assert np.abs(fy - dy).max() < 1e-7


def test_side_conditions_hold():
    # sum w = sum w*x = sum w*y = 0 in the centered frame
    # (thinplatespline.cpp rows 0-2 of the bordered system)
    sx, sy, dx, dy = _random_gcps(40)
    spl = fit_tps(sx, sy, dx, dy)
    for coef in (spl.coef_x, spl.coef_y):
        w = np.asarray(coef[3:])
        assert abs(w.sum()) < 1e-8
        assert abs((w * np.asarray(spl.xs)).sum()) < 1e-6
        assert abs((w * np.asarray(spl.ys)).sum()) < 1e-6


def test_exact_recovery_of_in_span_function():
    # generating map = affine + RBFs at 4 GCP-coincident centers with
    # side-condition-compliant weights -> unique interpolant == it,
    # so evaluation FAR outside the GCP hull must still match
    grid = np.array([(x, y) for x in range(0, 104, 8)
                     for y in range(0, 110, 10)], float)
    sx, sy = grid[:, 0], grid[:, 1]
    centers = np.array([(16, 30), (72, 30), (16, 80), (72, 80)], float)
    w = np.array([1, -1, -1, 1], float) / 64.0

    def gen(px, py):
        gx = 1.5 * px - 0.75 * py + 100.25
        gy = 0.5 * px + 2.25 * py - 50.5
        for (ux, uy), wk in zip(centers, w):
            d2 = (px - ux) ** 2 + (py - uy) ** 2
            u = np.where(d2 == 0, 0.0, d2 * np.log(np.where(d2 == 0, 1, d2)))
            gx = gx + wk * u
            gy = gy - wk * u
        return gx, gy

    gx, gy = gen(sx, sy)
    spl = fit_tps(sx, sy, gx, gy)
    px = RNG.uniform(-50, 250, 500)     # extrapolation included
    py = RNG.uniform(-50, 250, 500)
    fx, fy = _tps_eval_np(spl, px, py)
    tx, ty = gen(px, py)
    assert np.abs(fx - tx).max() < 1e-6
    assert np.abs(fy - ty).max() < 1e-6
    # the recovered RBF weights: +-1/64 at the 4 centers, ~0 elsewhere
    wmap = dict(zip(zip(spl.xs + np.mean(sx), spl.ys + np.mean(sy)),
                    spl.coef_x[3:]))
    for (ux, uy), wk in zip(centers, w):
        assert abs(wmap[(ux, uy)] - wk) < 1e-9


def test_degenerate_gcps_raise():
    with pytest.raises(ValueError):
        fit_tps([0, 1], [0, 1], [0, 1], [0, 1])            # < 3 points
    with pytest.raises(ValueError):
        fit_tps([0, 1, 2, 3], [0, 1, 2, 3],
                [0, 2, 4, 6], [1, 3, 5, 7])                # collinear


@pytest.mark.parametrize("n", [5, COLUMN_PATH_MAX_GCPS + 10])
def test_column_path_matches_pandas_path(spark, n):
    sx, sy, dx, dy = _random_gcps(n)
    spl = fit_tps(sx, sy, dx, dy)
    import pyspark.sql.functions as F
    pts = spark.range(300).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 17) % 211).cast("double").alias("px"),
        ((F.col("id") * 31) % 223).cast("double").alias("py"))
    rows = tps_transform(pts, spl).orderBy("doc_id").collect()
    got_x = np.array([r.geo_x for r in rows])
    got_y = np.array([r.geo_y for r in rows])
    px = (np.arange(300) * 17) % 211
    py = (np.arange(300) * 31) % 223
    ex, ey = _tps_eval_np(spl, px.astype(float), py.astype(float))
    # Column path: Java Math.log vs numpy log -> ulps.  Pandas path:
    # same numpy evaluator, but BLAS picks batch-shape-dependent
    # summation orders for u @ w, so worker batches differ from the
    # single local call by ~1e-11 — tiny vs the 1e-7 oracle budget.
    assert np.abs(got_x - ex).max() <= 1e-9
    assert np.abs(got_y - ey).max() <= 1e-9


def test_spline_is_plain_data():
    # the broadcast payload is a frozen dataclass of floats (no numpy
    # arrays / no DataFrame capture) so Column-path closures are tiny
    spl = fit_tps([0, 10, 3, 8], [0, 2, 9, 7], [1, 2, 3, 4], [4, 3, 2, 1])
    assert isinstance(spl, TPSSpline)
    assert all(isinstance(v, float) for v in spl.coef_x + spl.coef_y)

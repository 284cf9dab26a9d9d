"""GCP polynomial transformer tests (gdal_crs.cpp parity).

The solver is cross-checked against numpy's independent SVD-based
least-squares (`np.linalg.lstsq`) — a different algorithm than the
reference's normal-equations + Gauss-Jordan, so agreement is real
evidence, not a serial twin."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.gcp_transform import (
    GCPPolynomial, fit_gcp_polynomial, fit_gcp_transformer,
    gcp_transform, n_terms,
)

RNG = np.random.default_rng(42)


def _eval(poly: GCPPolynomial, px, py):
    e1 = np.asarray(px, float) - poly.x_mean
    n1 = np.asarray(py, float) - poly.y_mean
    E, N = poly.coef_x, poly.coef_y
    terms = [np.ones_like(e1), e1, n1, e1 * e1, e1 * n1, n1 * n1,
             e1 ** 3, e1 * e1 * n1, e1 * n1 * n1, n1 ** 3]
    nt = n_terms(poly.order)
    gx = sum(c * tm for c, tm in zip(E, terms[:nt]))
    gy = sum(c * tm for c, tm in zip(N, terms[:nt]))
    return gx, gy


def test_exactdet_order1_interpolates():
    # exactly 3 GCPs: exactdet path must pass through every GCP
    px = np.array([0.0, 10.0, 3.0])
    py = np.array([0.0, 2.0, 9.0])
    gx = 2.0 * px - 1.0 * py + 5.0
    gy = 0.5 * px + 3.0 * py - 7.0
    poly = fit_gcp_polynomial(px, py, gx, gy, order=1)
    fx, fy = _eval(poly, px, py)
    assert np.abs(fx - gx).max() < 1e-9 and np.abs(fy - gy).max() < 1e-9


@pytest.mark.parametrize("order", [1, 2, 3])
def test_lsq_matches_numpy_lstsq(order):
    # noisy overdetermined fit: coefficients must match an INDEPENDENT
    # solver (SVD lstsq) on the same centered design
    n = 200
    px = RNG.uniform(0, 100, n)
    py = RNG.uniform(0, 100, n)
    gx = 1.5 * px - 0.75 * py + 100.0 + RNG.normal(0, 0.5, n)
    gy = 0.5 * px + 2.25 * py - 50.0 + RNG.normal(0, 0.5, n)
    poly = fit_gcp_polynomial(px, py, gx, gy, order=order)
    e1 = px - poly.x_mean
    n1 = py - poly.y_mean
    cols = [np.ones(n), e1, n1, e1 * e1, e1 * n1, n1 * n1,
            e1 ** 3, e1 * e1 * n1, e1 * n1 * n1, n1 ** 3]
    design = np.stack(cols[:n_terms(order)], axis=1)
    ref_x = np.linalg.lstsq(design, gx, rcond=None)[0]
    ref_y = np.linalg.lstsq(design, gy, rcond=None)[0]
    assert np.abs(np.array(poly.coef_x) - ref_x).max() < 1e-8
    assert np.abs(np.array(poly.coef_y) - ref_y).max() < 1e-8


def test_order3_recovers_exact_cubic():
    n = 64
    px = RNG.uniform(-50, 50, n)
    py = RNG.uniform(-50, 50, n)
    gx = (0.25 + 1.5 * px - 0.5 * py + 0.01 * px * px - 0.002 * px * py
          + 0.003 * py * py + 1e-4 * px ** 3 - 2e-4 * px * px * py
          + 3e-5 * px * py * py - 5e-5 * py ** 3)
    gy = 2.0 * py - 0.125 * px
    poly = fit_gcp_polynomial(px, py, gx, gy, order=3)
    tx = np.linspace(-40, 40, 17)
    ty = np.linspace(-40, 40, 17)
    fx, fy = _eval(poly, tx, ty)
    ex = (0.25 + 1.5 * tx - 0.5 * ty + 0.01 * tx * tx - 0.002 * tx * ty
          + 0.003 * ty * ty + 1e-4 * tx ** 3 - 2e-4 * tx * tx * ty
          + 3e-5 * tx * ty * ty - 5e-5 * ty ** 3)
    assert np.abs(fx - ex).max() < 1e-7
    assert np.abs(fy - (2.0 * ty - 0.125 * tx)).max() < 1e-9


def test_forward_inverse_affine_roundtrip():
    n = 50
    px = RNG.uniform(0, 512, n)
    py = RNG.uniform(0, 512, n)
    gx = 0.5 * px - 0.25 * py + 1000.0
    gy = 0.125 * px + 0.75 * py - 200.0
    fwd, inv = fit_gcp_transformer(px, py, gx, gy, order=1)
    fx, fy = _eval(fwd, px, py)
    bx, by = _eval(inv, fx, fy)
    assert np.abs(bx - px).max() < 1e-8 and np.abs(by - py).max() < 1e-8


def test_too_few_gcps_raises():
    with pytest.raises(ValueError, match="needs >="):
        fit_gcp_polynomial([0, 1], [0, 1], [0, 1], [0, 1], order=1)
    with pytest.raises(ValueError, match="needs >="):
        fit_gcp_polynomial([0, 1, 2, 3], [0, 1, 2, 3],
                           [0, 1, 2, 3], [0, 1, 2, 3], order=2)


def test_collinear_gcps_unsolvable():
    px = np.array([0.0, 1.0, 2.0, 3.0])
    py = 2.0 * px              # perfectly collinear
    with pytest.raises(ValueError, match="co-linear"):
        fit_gcp_polynomial(px, py, px, py, order=1)


def test_column_evaluation_bitmatches_serial(spark):
    """gcp_transform's Column expression follows CRS_georef's exact
    product/sum shape — the JVM evaluation must equal the same-shape
    python evaluation bit-for-bit."""
    import pandas as pd

    n = 100
    px = np.floor(RNG.uniform(0, 100, n))
    py = np.floor(RNG.uniform(0, 100, n))
    gx = 1.5 * px - 0.75 * py + 10.25 + 0.001953125 * px * px
    gy = 2.25 * py - 0.5 * px - 3.5 + 0.0009765625 * py * py
    poly = fit_gcp_polynomial(px, py, gx, gy, order=2)

    df = spark.createDataFrame(pd.DataFrame({"px": px, "py": py}))
    got = (gcp_transform(df, poly).orderBy("px", "py")
           .toPandas())

    # serial twin with CRS_georef's exact shape (not numpy vector ops
    # with different association)
    def serial(p, q):
        e1 = p - poly.x_mean
        n1 = q - poly.y_mean
        e2 = e1 * e1
        en = e1 * n1
        n2 = n1 * n1
        E, N = poly.coef_x, poly.coef_y
        return (E[0] + E[1] * e1 + E[2] * n1 + E[3] * e2 + E[4] * en
                + E[5] * n2,
                N[0] + N[1] * e1 + N[2] * n1 + N[3] * e2 + N[4] * en
                + N[5] * n2)

    order = np.lexsort((py, px))
    for row, i in zip(got.itertuples(index=False), order):
        sx, sy = serial(float(px[i]), float(py[i]))
        assert row.geo_x == sx and row.geo_y == sy

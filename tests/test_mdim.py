"""MDArray view ops (operators/mdim.py) vs numpy reference slicing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import mdim as md


def _cube_df(spark, T=3, Y=6, X=8):
    n = T * Y * X
    return spark.range(n).select(
        F.floor(F.col("id") / (Y * X)).cast("long").alias("t"),
        (F.floor(F.col("id") / X) % Y).cast("long").alias("y"),
        (F.col("id") % X).alias("x"),
        ((F.col("id") * 13) % 97).alias("value"),
    )


def _cube_np(T=3, Y=6, X=8):
    return (np.arange(T * Y * X, dtype=np.int64) * 13 % 97).reshape(T, Y, X)


def test_slice_matches_numpy(spark):
    df = md.mdim_slice(_cube_df(spark), {"t": (1, 3, 1),
                                         "y": (0, 6, 2),
                                         "x": (3, 8, 3)})
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in df.collect()}
    ref = _cube_np()[1:3:1, 0:6:2, 3:8:3]
    assert len(got) == ref.size
    for (t, y, x), v in got.items():
        assert ref[t, y, x] == v


def test_slice_rejects_bad_step(spark):
    with pytest.raises(ValueError, match="step"):
        md.mdim_slice(_cube_df(spark), {"t": (0, 3, 0)})


def test_transpose_matches_numpy(spark):
    df = md.mdim_transpose(_cube_df(spark), ["t", "y", "x"], [2, 0, 1])
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in df.collect()}
    ref = _cube_np().transpose(2, 0, 1)
    for (t, y, x), v in got.items():
        assert ref[t, y, x] == v
    with pytest.raises(ValueError, match="permute"):
        md.mdim_transpose(_cube_df(spark), ["t", "y", "x"], [0, 0, 1])


def test_unscaled_and_mask(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, 255), (2, 100), (3, 9)], "i long, value long")
    u = md.mdim_unscaled(df, scale=2.0, offset=1.0, nodata=255)
    rows = {r["i"]: r["unscaled"] for r in u.collect()}
    assert rows[0] == 11.0 and rows[1] is None and rows[2] == 201.0
    m = md.mdim_mask(df, nodata=255, valid_min=10, valid_max=200)
    masks = {r["i"]: r["mask"] for r in m.collect()}
    assert masks == {0: 0, 1: 0, 2: 1, 3: 0}


def test_slice_plan_is_narrow(spark):
    plan = md.mdim_slice(_cube_df(spark), {"x": (0, 4, 2)})._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------- resample
def _bilinear_np(src: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Reference bilinear resample of the trailing 2 dims, edge-clamped,
    sample centers at (i+0.5)*scale-0.5."""
    T, sy, sx = src.shape
    out = np.empty((T, dy, dx), dtype=np.float64)
    cy = np.clip((np.arange(dy) + 0.5) * (sy / dy) - 0.5, 0, sy - 1)
    cx = np.clip((np.arange(dx) + 0.5) * (sx / dx) - 0.5, 0, sx - 1)
    y0 = np.floor(cy).astype(int); fy = cy - y0
    x0 = np.floor(cx).astype(int); fx = cx - x0
    y1 = np.minimum(y0 + 1, sy - 1); x1 = np.minimum(x0 + 1, sx - 1)
    for t in range(T):
        a = src[t]
        out[t] = ((1 - fy)[:, None] * (1 - fx)[None, :] * a[np.ix_(y0, x0)]
                  + (1 - fy)[:, None] * fx[None, :] * a[np.ix_(y0, x1)]
                  + fy[:, None] * (1 - fx)[None, :] * a[np.ix_(y1, x0)]
                  + fy[:, None] * fx[None, :] * a[np.ix_(y1, x1)])
    return out


@pytest.mark.parametrize("dst", [(9, 11), (3, 5), (6, 8), (13, 3)])
def test_resample_bilinear_matches_numpy(spark, dst):
    # non-dyadic ratios both ways: up, down, identity-ish, mixed
    dy, dx = dst
    df = md.mdim_resample(_cube_df(spark), "y", "x", (6, 8), (dy, dx),
                          alg="bilinear")
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in df.collect()}
    ref = _bilinear_np(_cube_np().astype(np.float64), dy, dx)
    assert len(got) == 3 * dy * dx
    for (t, y, x), v in got.items():
        assert v == pytest.approx(ref[t, y, x], abs=1e-9)


@pytest.mark.parametrize("dst", [(3, 4), (12, 16), (5, 7)])
def test_resample_nearest_matches_numpy(spark, dst):
    dy, dx = dst
    df = md.mdim_resample(_cube_df(spark), "y", "x", (6, 8), (dy, dx),
                          alg="nearest")
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in df.collect()}
    ref = _cube_np()
    iy = np.floor((np.arange(dy) + 0.5) * (6 / dy)).astype(int).clip(0, 5)
    ix = np.floor((np.arange(dx) + 0.5) * (8 / dx)).astype(int).clip(0, 7)
    assert len(got) == 3 * dy * dx
    for (t, y, x), v in got.items():
        assert v == ref[t, iy[y], ix[x]]


def test_resample_average_matches_numpy(spark):
    df = md.mdim_resample(_cube_df(spark), "y", "x", (6, 8), (3, 4),
                          alg="average")
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in df.collect()}
    ref = _cube_np().astype(np.float64).reshape(3, 3, 2, 4, 2) \
        .mean(axis=(2, 4))
    assert len(got) == 3 * 3 * 4
    for (t, y, x), v in got.items():
        assert v == pytest.approx(ref[t, y, x])


def test_resample_rejects_bad_alg(spark):
    with pytest.raises(ValueError, match="alg"):
        md.mdim_resample(_cube_df(spark), "y", "x", (6, 8), (3, 4),
                         alg="cubicfake")


def test_statistics_matches_numpy(spark):
    ref = _cube_np().astype(np.float64)
    nod = float(ref[1, 2, 3])
    vals = ref[ref != nod]
    row = md.mdim_statistics(_cube_df(spark), nodata=nod).collect()[0]
    assert row["valid_count"] == vals.size
    assert row["min"] == vals.min() and row["max"] == vals.max()
    assert row["mean"] == pytest.approx(vals.mean())
    assert row["std"] == pytest.approx(vals.std(), rel=1e-12)


def _cubic_np(src: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Reference 4-tap cubic convolution (a=-0.5), edge-renormalized
    exactly like the operator: sum(w*v)/sum(w) over in-bounds taps."""
    def wk(t):
        a, t = -0.5, abs(t)
        if t < 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
        return 0.0

    T, sy, sx = src.shape
    out = np.empty((T, dy, dx))
    for t in range(T):
        for i in range(dy):
            cy = (i + 0.5) * (sy / dy) - 0.5
            for k in range(dx):
                cx = (k + 0.5) * (sx / dx) - 0.5
                num = den = 0.0
                for jy in range(max(0, int(np.floor(cy)) - 1),
                                min(sy, int(np.floor(cy)) + 3)):
                    for jx in range(max(0, int(np.floor(cx)) - 1),
                                    min(sx, int(np.floor(cx)) + 3)):
                        w = wk(cy - jy) * wk(cx - jx)
                        num += w * src[t, jy, jx]
                        den += w
                out[t, i, k] = num / den
    return out


@pytest.mark.parametrize("dst", [(9, 11), (4, 5)])
def test_resample_cubic_matches_numpy(spark, dst):
    dy, dx = dst
    df = md.mdim_resample(_cube_df(spark), "y", "x", (6, 8), (dy, dx),
                          alg="cubic")
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in df.collect()}
    ref = _cubic_np(_cube_np().astype(np.float64), dy, dx)
    assert len(got) == 3 * dy * dx
    for (t, y, x), v in got.items():
        assert v == pytest.approx(ref[t, y, x], rel=1e-9, abs=1e-9)

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

"""Hex binning — defining lattice properties (independent of our code).

A correct pointy-top hex binning means: the assigned cell center is
the NEAREST center among all lattice cells (ties excluded by the
sample), and every point lies within the hex circumradius of its
center.  Both are checked brute-force against a materialized lattice.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators.hexbin import with_hex_cell

SIZE = 10.0


def _centers(qs, rs):
    q, r = np.meshgrid(qs, rs, indexing="ij")
    x = SIZE * math.sqrt(3.0) * (q + r / 2.0)
    y = SIZE * 1.5 * r
    return q.ravel(), r.ravel(), x.ravel(), y.ravel()


def test_nearest_center_property(spark):
    rng = np.random.RandomState(3)
    pts = rng.uniform(-40.0, 40.0, size=(500, 2))
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "x double, y double")
    out = with_hex_cell(df, "x", "y", SIZE).toPandas()

    cq, cr, cx, cy = _centers(np.arange(-8, 9), np.arange(-8, 9))
    for _, row in out.iterrows():
        d = (cx - row["x"]) ** 2 + (cy - row["y"]) ** 2
        k = int(np.argmin(d))
        assert (row["hexq"], row["hexr"]) == (cq[k], cr[k])
        # inside the circumradius of the assigned hex
        dc = math.hypot(row["hexx"] - row["x"], row["hexy"] - row["y"])
        assert dc <= SIZE + 1e-9


def test_center_point_roundtrip(spark):
    # Feeding exact cell centers returns those exact cells.
    cq, cr, cx, cy = _centers(np.arange(-5, 6), np.arange(-5, 6))
    df = spark.createDataFrame(
        [(float(x), float(y), int(q), int(r))
         for q, r, x, y in zip(cq, cr, cx, cy)],
        "x double, y double, q long, r long")
    out = with_hex_cell(df, "x", "y", SIZE)
    bad = out.filter((F.col("hexq") != F.col("q"))
                     | (F.col("hexr") != F.col("r"))).count()
    assert bad == 0


def test_no_udf_in_plan(spark):
    df = spark.range(10).select(
        (F.col("id") * 1.7).alias("x"), (F.col("id") * 0.3).alias("y"))
    out = with_hex_cell(df, "x", "y", SIZE)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

"""Multidim (GDALMDArray) view pipeline — §1.3 surface.

A 4x8x12 hypercube is derived from doc_id by pure integer arithmetic
(doc_id = 96t + 12y + x, value = (doc_id*37) % 1000), then pushed
through the composable view chain GDAL exposes on MDArrays:
slice (GetView) -> transpose -> unscale (GetUnscaled) -> validity
mask (GetMask).  The oracle restates the whole chain relationally —
slice re-index = integer div, transpose = column swap, unscale =
identical IEEE literals.

nodata is planted at 518 = value(doc_id=14), the first cell the
slice keeps, so the NULL branch is exercised.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register, t
from ..operators import mdim as md


@register(
    "mdim_view",
    sql="""
    WITH cube AS (
      SELECT doc_id // 96 AS t, (doc_id // 12) % 8 AS y, doc_id % 12 AS x,
             (doc_id * 37) % 1000 AS value
      FROM documents WHERE doc_id < 384
    ),
    sliced AS (
      SELECT t, (y - 1) // 2 AS y, (x - 2) // 3 AS x, value
      FROM cube
      WHERE y >= 1 AND y < 7 AND (y - 1) % 2 = 0
        AND x >= 2 AND x < 12 AND (x - 2) % 3 = 0
    ),
    tr AS (
      SELECT x AS t, t AS y, y AS x, value FROM sliced
    )
    SELECT * FROM (
      SELECT t, y, x, value,
             CASE WHEN value = 518 THEN NULL
                  ELSE CAST(value AS DOUBLE) * 0.1 + -5.0 END AS unscaled,
             CAST(CASE WHEN value <> 518 AND value >= 10 AND value <= 990
                  THEN 1 ELSE 0 END AS INT) AS mask
      FROM tr
    ) ORDER BY t, y, x
    """,
    desc="GDALMDArray view chain (gdalmultidim.cpp:5762 GetView, :6205 "
         "Transpose, :2935 GetUnscaled, :7484 GetMask) over a long-form "
         "hypercube: slice+re-index, axis permutation, scale/offset with "
         "nodata->NULL, validity mask — all narrow Column ops, zero shuffle",
)
def mdim_view(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 384)
    cube = docs.select(
        F.floor(F.col("doc_id") / 96).cast("long").alias("t"),
        (F.floor(F.col("doc_id") / 12) % 8).cast("long").alias("y"),
        (F.col("doc_id") % 12).alias("x"),
        ((F.col("doc_id") * 37) % 1000).alias("value"),
    )
    sliced = md.mdim_slice(cube, {"y": (1, 7, 2), "x": (2, 12, 3)})
    tr = md.mdim_transpose(sliced, ["t", "y", "x"], [2, 0, 1])
    u = md.mdim_unscaled(tr, scale=0.1, offset=-5.0, nodata=518)
    m = md.mdim_mask(u, nodata=518, valid_min=10, valid_max=990)
    return m.select("t", "y", "x", "value", "unscaled", "mask").orderBy(
        "t", "y", "x")

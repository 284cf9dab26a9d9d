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


# ------------------------------------------------------------- resample
@register(
    "mdim_resample",
    sql="""
    WITH cube AS (
      SELECT doc_id // 96 AS t, (doc_id // 12) % 8 AS y, doc_id % 12 AS x,
             (doc_id * 37) % 1000 AS value
      FROM documents WHERE doc_id < 384
    ),
    dst AS (
      SELECT t.t, y.yd, x.xd
      FROM (SELECT DISTINCT t FROM cube) t
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS yd) y
      CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS xd) x
    ),
    p AS (
      SELECT t, yd, xd,
             GREATEST(0.0, LEAST(7.0,  (yd + 0.5) * 0.5 - 0.5)) AS cy,
             GREATEST(0.0, LEAST(11.0, (xd + 0.5) * 0.5 - 0.5)) AS cx
      FROM dst
    ),
    q AS (
      SELECT t, yd, xd,
             CAST(FLOOR(cy) AS BIGINT) AS y0, cy - FLOOR(cy) AS fy,
             CAST(FLOOR(cx) AS BIGINT) AS x0, cx - FLOOR(cx) AS fx
      FROM p
    )
    SELECT q.t AS t, q.yd AS y, q.xd AS x,
           (1 - fy) * (1 - fx) * c00.value + (1 - fy) * fx * c01.value
           + fy * (1 - fx) * c10.value + fy * fx * c11.value AS value
    FROM q
    JOIN cube c00 ON c00.t = q.t AND c00.y = q.y0 AND c00.x = q.x0
    JOIN cube c01 ON c01.t = q.t AND c01.y = q.y0
                  AND c01.x = LEAST(q.x0 + 1, 11)
    JOIN cube c10 ON c10.t = q.t AND c10.y = LEAST(q.y0 + 1, 7)
                  AND c10.x = q.x0
    JOIN cube c11 ON c11.t = q.t AND c11.y = LEAST(q.y0 + 1, 7)
                  AND c11.x = LEAST(q.x0 + 1, 11)
    ORDER BY t, y, x
    """,
    desc="GDALMDArray::GetResampled bilinear 2x upsample "
         "(gcore/gdalmultidim.cpp:8541) via source-side contribution "
         "emission + partial+final weighted agg: every src cell emits "
         "the dst cells its stencil touches, one shuffle on the output "
         "key; weights are dyadic (scale 0.5) so the grouped float sum "
         "is order-independent and hash-exact vs the 4-term oracle",
)
def mdim_resample_q(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 384)
    cube = docs.select(
        F.floor(F.col("doc_id") / 96).cast("long").alias("t"),
        (F.floor(F.col("doc_id") / 12) % 8).cast("long").alias("y"),
        (F.col("doc_id") % 12).alias("x"),
        ((F.col("doc_id") * 37) % 1000).alias("value"),
    )
    out = md.mdim_resample(cube, "y", "x", (8, 12), (16, 24),
                           alg="bilinear")
    return out.select("t", F.col("y").cast("long").alias("y"),
                      F.col("x").cast("long").alias("x"),
                      F.col("value").cast("double").alias("value")) \
              .orderBy("t", "y", "x")


@register(
    "mdim_resample_near",
    sql="""
    WITH cube AS (
      SELECT doc_id // 96 AS t, (doc_id // 12) % 8 AS y, doc_id % 12 AS x,
             (doc_id * 37) % 1000 AS value
      FROM documents WHERE doc_id < 384
    ),
    dst AS (
      SELECT t.t, y.yd, x.xd
      FROM (SELECT DISTINCT t FROM cube) t
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS yd) y
      CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS xd) x
    )
    SELECT d.t AS t, d.yd AS y, d.xd AS x, c.value AS value
    FROM dst d
    JOIN cube c
      ON c.t = d.t
     AND c.y = CAST(FLOOR((d.yd + 0.5) * 2.0) AS BIGINT)
     AND c.x = CAST(FLOOR((d.xd + 0.5) * 2.0) AS BIGINT)
    ORDER BY t, y, x
    """,
    desc="GetResampled nearest 2x downsample: zero-shuffle inversion — "
         "each src cell computes (sequence+explode) the dst range it "
         "serves, a pure narrow Generate with no Exchange; oracle "
         "restates the dst->src gather relationally",
)
def mdim_resample_near_q(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 384)
    cube = docs.select(
        F.floor(F.col("doc_id") / 96).cast("long").alias("t"),
        (F.floor(F.col("doc_id") / 12) % 8).cast("long").alias("y"),
        (F.col("doc_id") % 12).alias("x"),
        ((F.col("doc_id") * 37) % 1000).alias("value"),
    )
    out = md.mdim_resample(cube, "y", "x", (8, 12), (4, 6), alg="nearest")
    return out.select("t", "y", "x", "value").orderBy("t", "y", "x")


@register(
    "mdim_stats",
    sql="""
    WITH cube AS (
      SELECT doc_id // 96 AS t, (doc_id * 37) % 1000 AS value
      FROM documents WHERE doc_id < 384
    ),
    v AS (
      SELECT t, CASE WHEN value = 518 THEN NULL
                     ELSE CAST(value AS DOUBLE) END AS v
      FROM cube
    )
    SELECT t, MIN(v) AS min, MAX(v) AS max, AVG(v) AS mean,
           SQRT(AVG(v * v) - AVG(v) * AVG(v)) AS std,
           COUNT(v) AS valid_count
    FROM v GROUP BY t ORDER BY t
    """,
    desc="GDALMDArray statistics (gcore/gdalmultidim.cpp:10280): "
         "min/max/mean/population-std/valid count per leading slice, "
         "nodata excluded — one partial+final aggregate scan; std "
         "restated as sqrt(E[x^2]-E[x]^2) identically in both engines",
)
def mdim_stats_q(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 384)
    cube = docs.select(
        F.floor(F.col("doc_id") / 96).cast("long").alias("t"),
        ((F.col("doc_id") * 37) % 1000).alias("value"),
    )
    return md.mdim_statistics(cube, nodata=518, by=["t"]).orderBy("t")

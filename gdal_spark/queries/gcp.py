"""GCP polynomial georeferencing queries (gdalwarp -order N role).

Oracle design: the GCPs are synthesized so that (px, py) -> (gx, gy)
is EXACTLY a polynomial of the fitted order with dyadic-rational
coefficients over integer pixel coordinates — every derived value is
exact in IEEE double.  The oracle states the generating map in
closed form, fully independently of the engine: the Spark side must
recover it through the whole pipeline (GCP subset -> driver fit via
normal equations + Gauss-Jordan (gdal_crs.cpp calcls/solvemat) ->
Column CRS_georef evaluation), and any fit/evaluation defect shifts
the output far beyond the comparison margin.

Margin analysis (measured): the fitted-vs-generating output error is
<= ~3e-13 over sf0.01; true geo values are multiples of 2^-13, so
scaled by 2^20 they are exact INTEGERS and floor(x * 2^20 + 0.5)
sits a full 0.5 units from the nearest boundary — ~12 orders of
magnitude of slack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.gcp_transform import fit_gcp_transformer_df, gcp_transform
from . import register, t

# integer pixel-coordinate derivation: exact in both engines
PX_MUL, PX_MOD = 7919, 97
PY_MUL, PY_MOD = 104729, 101
GCP_EVERY = 16          # doc_id % 16 == 0 rows are the control points
SCALE = 1048576.0       # 2^20: scaled true values are exact integers

# dyadic generating coefficients (exactly representable; all products
# with integer pixels and their pairwise sums are exact doubles)
LIN = {  # order-1 part, used by both maps
    "gx": (1.5, -0.75, 100.25),     # gx = a*px + b*py + c
    "gy": (0.5, 2.25, -50.5),
}
QUAD = {  # extra order-2 terms: d*px^2 + e*px*py + f*py^2
    "gx": (3 / 1024, -5 / 2048, 7 / 4096),
    "gy": (-9 / 4096, 11 / 2048, -13 / 8192),
}


def _pix_cols() -> tuple:
    px = (F.col("doc_id") * F.lit(PX_MUL)) % F.lit(PX_MOD)
    py = (F.col("doc_id") * F.lit(PY_MUL)) % F.lit(PY_MOD)
    return px.cast("double"), py.cast("double")


def _gen_col(which: str, px, py, order: int):
    a, b, c = LIN[which]
    out = F.lit(a) * px + F.lit(b) * py + F.lit(c)
    if order >= 2:
        d, e, f = QUAD[which]
        out = out + F.lit(d) * (px * px) + F.lit(e) * (px * py) \
            + F.lit(f) * (py * py)
    return out


def _gen_sql(which: str, order: int) -> str:
    a, b, c = LIN[which]
    s = (f"'{a!r}'::DOUBLE * px + '{b!r}'::DOUBLE * py"
         f" + '{c!r}'::DOUBLE")
    if order >= 2:
        d, e, f = QUAD[which]
        s += (f" + '{d!r}'::DOUBLE * (px * px)"
              f" + '{e!r}'::DOUBLE * (px * py)"
              f" + '{f!r}'::DOUBLE * (py * py)")
    return s


def _gcp_query(spark: SparkSession, sf_dir: str, order: int) -> DataFrame:
    px, py = _pix_cols()
    pts = t(spark, sf_dir, "documents").select(
        "doc_id", px.alias("px"), py.alias("py"))
    gcps = (pts.filter(F.col("doc_id") % GCP_EVERY == 0)
            .withColumn("gx", _gen_col("gx", F.col("px"), F.col("py"), order))
            .withColumn("gy", _gen_col("gy", F.col("px"), F.col("py"), order)))
    fwd, _inv = fit_gcp_transformer_df(gcps, order=order)
    out = gcp_transform(pts, fwd)
    half = F.lit(0.5)
    return out.select(
        "doc_id",
        F.floor(F.col("geo_x") * F.lit(SCALE) + half).cast("long").alias("sx"),
        F.floor(F.col("geo_y") * F.lit(SCALE) + half).cast("long").alias("sy"),
    )


def _gcp_oracle(order: int) -> str:
    return f"""
    WITH pts AS (
        SELECT doc_id,
               CAST((doc_id * {PX_MUL}) % {PX_MOD} AS DOUBLE) AS px,
               CAST((doc_id * {PY_MUL}) % {PY_MOD} AS DOUBLE) AS py
        FROM documents
    )
    SELECT doc_id,
           CAST(FLOOR(({_gen_sql('gx', order)}) * '{SCALE!r}'::DOUBLE
                      + '0.5'::DOUBLE) AS BIGINT) AS sx,
           CAST(FLOOR(({_gen_sql('gy', order)}) * '{SCALE!r}'::DOUBLE
                      + '0.5'::DOUBLE) AS BIGINT) AS sy
    FROM pts
    """


@register("gcp_order1", sql=_gcp_oracle(1),
          desc="GCP order-1 polynomial georeferencing: LSQ fit over the "
               "control subset recovers the exact generating affine map "
               "(gdal_crs.cpp calcls/solvemat/CRS_georef)")
def gcp_order1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gcp_query(spark, sf_dir, 1)


@register("gcp_order2", sql=_gcp_oracle(2),
          desc="GCP order-2 polynomial georeferencing: 6-term fit recovers "
               "the exact generating quadratic map")
def gcp_order2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gcp_query(spark, sf_dir, 2)

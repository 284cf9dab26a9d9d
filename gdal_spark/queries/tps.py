"""Thin-plate-spline georeferencing queries (gdalwarp -tps role).

Oracle design (same exact-recovery discipline as gcp.py): GCP
targets are synthesized as  affine + sum_k w_k * U(|P - C_k|)  with
the K centers C_k chosen to BE GCP source points and the weights
w_k satisfying the TPS side conditions (sum w = 0, sum w*x = 0,
sum w*y = 0 — invariant under the solver's mean-centering).  The
full TPS interpolant through such GCPs is UNIQUE and equals the
generating function, so the oracle can state it in closed form —
completely independent of the engine's bordered-system solve
(thinplatespline.cpp solve() :536-608).  Any fit or evaluation
defect shifts the output far beyond the margin.

Margin analysis (measured, scripts prototype + test_tps.py): the
fitted-vs-generating error is <= ~3e-12 over the sf0.01 evaluation
points for both GCP set sizes; cross-engine LN differs by ulps
(~1e-11 after the d2 ~ 2e4 amplification).  At SCALE = 2^14 the
scaled error is < 1e-7, against an expected boundary distance of
O(0.1) for the irrational RBF part — ~6 orders of magnitude of
slack, while still checking ~7 significant digits.

Two queries cover both execution paths of the operator:

* ``tps_transform_small`` — 16 GCPs (4x4 grid), at
  COLUMN_PATH_MAX_GCPS: pure whole-stage-codegen Column arithmetic;
* ``tps_transform_full`` — 143 GCPs (13x11 grid), above the cutoff:
  Arrow-batched pandas evaluation (one (batch x n) numpy distance
  matrix per batch, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..operators.tps_transform import fit_tps_df, tps_transform
from . import register, t

# evaluation pixel grid: same exact integer derivation as gcp.py
PX_MUL, PX_MOD = 7919, 97
PY_MUL, PY_MOD = 104729, 101
SCALE = 16384.0          # 2^14 (see margin analysis above)

# affine part (dyadic: exact in IEEE double for integer pixels)
AFF = {
    "gx": (1.5, -0.75, 100.25),
    "gy": (0.5, 2.25, -50.5),
}
#: RBF weight magnitude; the (+,-,-,+) rectangle pattern makes
#: sum w = sum w*x = sum w*y = 0 for ANY axis-aligned rectangle
W = 1.0 / 64.0

# GCP source grids (derived from doc_id Spark-side only — the oracle
# never sees the GCPs, it states the generating map; combinations are
# covered because doc_id spans 0..499: SMALL enumerates (doc_id//4 % 4,
# doc_id % 4), FULL uses CRT over coprime mods 13 and 11)
SMALL = dict(xdiv=4, xmod=4, xmul=1, xscale=32, ymod=4, ymul=1, yscale=33,
             centers=((32, 33), (64, 33), (32, 66), (64, 66)))
FULL = dict(xdiv=1, xmod=13, xmul=1, xscale=8, ymod=11, ymul=7, yscale=10,
            centers=((16, 30), (72, 30), (16, 80), (72, 80)))
WEIGHTS = (W, -W, -W, W)


def _u_col(d2: Column) -> Column:
    return F.when(d2 == 0.0, F.lit(0.0)).otherwise(d2 * F.log(d2))


def _gen_cols(px: Column, py: Column, grid: dict) -> tuple[Column, Column]:
    ax, bx, cx = AFF["gx"]
    ay, by, cy = AFF["gy"]
    gx = F.lit(ax) * px + F.lit(bx) * py + F.lit(cx)
    gy = F.lit(ay) * px + F.lit(by) * py + F.lit(cy)
    for (ux, uy), w in zip(grid["centers"], WEIGHTS):
        d2 = (px - F.lit(float(ux))) * (px - F.lit(float(ux))) \
            + (py - F.lit(float(uy))) * (py - F.lit(float(uy)))
        u = _u_col(d2)
        gx = gx + F.lit(w) * u
        gy = gy - F.lit(w) * u      # opposite sign: y-spline differs
    return gx, gy


def _tps_query(spark: SparkSession, sf_dir: str, grid: dict) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # GCP sources: a small deterministic grid; duplicates collapse via
    # distinct() BEFORE target derivation keeps the fit set exact
    base = F.floor(F.col("doc_id") / F.lit(grid["xdiv"])).cast("long")
    gcps = (docs.select(
        ((base * grid["xmul"]) % grid["xmod"]
         * grid["xscale"]).cast("double").alias("px"),
        ((F.col("doc_id") * grid["ymul"]) % grid["ymod"]
         * grid["yscale"]).cast("double").alias("py"))
        .distinct())
    gx, gy = _gen_cols(F.col("px"), F.col("py"), grid)
    gcps = gcps.withColumn("gx", gx).withColumn("gy", gy)
    spline = fit_tps_df(gcps)

    pts = docs.select(
        "doc_id",
        ((F.col("doc_id") * PX_MUL) % PX_MOD).cast("double").alias("px"),
        ((F.col("doc_id") * PY_MUL) % PY_MOD).cast("double").alias("py"))
    out = tps_transform(pts, spline)
    half = F.lit(0.5)
    return out.select(
        "doc_id",
        F.floor(F.col("geo_x") * F.lit(SCALE) + half).cast("long").alias("sx"),
        F.floor(F.col("geo_y") * F.lit(SCALE) + half).cast("long").alias("sy"),
    )


def _gen_sql(which: str, grid: dict) -> str:
    a, b, c = AFF[which]
    s = f"'{a!r}'::DOUBLE * px + '{b!r}'::DOUBLE * py + '{c!r}'::DOUBLE"
    sign = 1.0 if which == "gx" else -1.0
    for (ux, uy), w in zip(grid["centers"], WEIGHTS):
        d2 = f"((px - {ux}) * (px - {ux}) + (py - {uy}) * (py - {uy}))"
        u = f"(CASE WHEN {d2} = 0 THEN 0 ELSE {d2} * LN({d2}) END)"
        s += f" + '{sign * w!r}'::DOUBLE * {u}"
    return s


def _tps_oracle(grid: dict) -> str:
    return f"""
    WITH pts AS (
        SELECT doc_id,
               CAST((doc_id * {PX_MUL}) % {PX_MOD} AS DOUBLE) AS px,
               CAST((doc_id * {PY_MUL}) % {PY_MOD} AS DOUBLE) AS py
        FROM documents
    )
    SELECT doc_id,
           CAST(FLOOR(({_gen_sql('gx', grid)}) * '{SCALE!r}'::DOUBLE
                      + '0.5'::DOUBLE) AS BIGINT) AS sx,
           CAST(FLOOR(({_gen_sql('gy', grid)}) * '{SCALE!r}'::DOUBLE
                      + '0.5'::DOUBLE) AS BIGINT) AS sy
    FROM pts
    """


@register("tps_transform_small", sql=_tps_oracle(SMALL),
          desc="TPS georeferencing, 16 GCPs (Column/codegen path): the "
               "bordered-system solve (thinplatespline.cpp solve) recovers "
               "the exact generating affine+RBF map")
def tps_transform_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tps_query(spark, sf_dir, SMALL)


@register("tps_transform_full", sql=_tps_oracle(FULL),
          desc="TPS georeferencing, 143 GCPs (Arrow/pandas path above "
               "COLUMN_PATH_MAX_GCPS): same exact-recovery oracle")
def tps_transform_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tps_query(spark, sf_dir, FULL)

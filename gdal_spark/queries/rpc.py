"""RPC transformer queries (gdalwarp -rpc role).

Oracle design: the DuckDB oracle re-derives the WHOLE transformer in
SQL, independently of the engine —

* the 20-term basis and two-accumulator rational evaluation
  (gdal_rpc.cpp RPCComputeTerms :192-215 / RPCEvaluate :337-350)
  are restated as SQL arithmetic in the same literal operation
  order, so doubles are bit-identical;
* for the inverse, even the transformer-creation step happens in
  SQL: the reference-point forward projections, the 1e-4-degree
  finite-difference affine (gdal_rpc.cpp:1040-1090) and its
  GDALInvGeoTransform inversion (gdaltransformer.cpp:4543-4563,
  general path — DEMO_RPC's cross terms are nonzero so the
  no-rotation fast path cannot trigger) are scalar SQL over the
  coefficient literals, and the 10-round iterate/freeze loop
  (RPCInverseTransformPoint :1128-1372) is unrolled as chained
  CTEs with the same pre-update convergence freeze.

Every derived value is the same IEEE double in Spark, numpy and
DuckDB (same literal constants, same operation order), so outputs
are compared through the exact floor(x * 2^k + 0.5) integerization
with no float-hash risk.

The synthetic DEMO_RPC is identity-dominated (numerators ~ P resp.
L, denominators ~ 1) with deterministic degree-damped perturbation
terms — the shape of a real satellite RPC, guaranteed invertible
over its validity bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.rpc_transform import (
    LL_DELTA, MAX_ITERATIONS, PIX_ERR_THRESHOLD, RPCModel, RPC_TERM_EXP,
    rpc_forward, rpc_inverse,
)
from . import register, t


def _eps(j: int, k: int) -> float:
    """Deterministic perturbation in [-0.5, 0.5): polynomial j
    (0=samp_num..3=line_den), term slot k — the same xor mix as the
    LSH plane table (decorrelated across slots)."""
    return ((j * 73856093) ^ (k * 19349663)) % 1000003 % 1000 / 1000.0 - 0.5


def _coeffs(kind: int, unit_slot: int | None) -> tuple[float, ...]:
    """20 coefficients: 1.0 at ``unit_slot`` (P for samp, L for line,
    slot 0 for denominators) plus degree-damped perturbations —
    1e-2 linear, 1e-3 quadratic, 1e-4 cubic (1e-4 flat for
    denominators, constant term exactly 1)."""
    out = []
    for s, (i, j, k) in enumerate(RPC_TERM_EXP):
        deg = i + j + k
        if unit_slot == 0:           # denominator
            base = 1.0 if s == 0 else 0.0
            damp = 0.0 if s == 0 else 1e-4
        else:
            base = 1.0 if s == unit_slot else 0.0
            damp = (0.0, 1e-2, 1e-3, 1e-4)[deg]
        out.append(base + _eps(kind, s) * damp)
    return tuple(out)


DEMO_RPC = RPCModel(
    long_off=8.0, long_scale=2.0,
    lat_off=45.0, lat_scale=2.0,
    height_off=500.0, height_scale=1000.0,
    samp_off=2000.0, samp_scale=2000.0,
    line_off=1500.0, line_scale=1500.0,
    samp_num=_coeffs(0, 1),   # ~P
    samp_den=_coeffs(1, 0),
    line_num=_coeffs(2, 2),   # ~L
    line_den=_coeffs(3, 0),
    min_long=6.0, max_long=10.0, min_lat=43.0, max_lat=47.0,
)

# deterministic lon/lat/height derivation from doc_id — identical
# integer-then-double arithmetic in both engines
LON_AMP = DEMO_RPC.long_scale * 0.8
LAT_AMP = DEMO_RPC.lat_scale * 0.8
H_AMP = DEMO_RPC.height_scale * 0.5
PX_SCALE = 1048576.0        # 2^20 integerization of pixel coords
LL_SCALE = 67108864.0       # 2^26 integerization of lon/lat


def _lonlat_cols():
    lon = F.lit(DEMO_RPC.long_off) + (
        ((F.col("doc_id") * 37) % 101).cast("double") - F.lit(50.0)
    ) / F.lit(50.0) * F.lit(LON_AMP)
    lat = F.lit(DEMO_RPC.lat_off) + (
        ((F.col("doc_id") * 59) % 89).cast("double") - F.lit(44.0)
    ) / F.lit(44.0) * F.lit(LAT_AMP)
    h = F.lit(DEMO_RPC.height_off) + (
        ((F.col("doc_id") * 13) % 41).cast("double") - F.lit(20.0)
    ) / F.lit(20.0) * F.lit(H_AMP)
    return lon, lat, h


_PTS_SQL = f"""
    SELECT doc_id,
           '{DEMO_RPC.long_off!r}'::DOUBLE
             + (CAST((doc_id * 37) % 101 AS DOUBLE) - 50.0) / 50.0
               * '{LON_AMP!r}'::DOUBLE AS lon,
           '{DEMO_RPC.lat_off!r}'::DOUBLE
             + (CAST((doc_id * 59) % 89 AS DOUBLE) - 44.0) / 44.0
               * '{LAT_AMP!r}'::DOUBLE AS lat,
           '{DEMO_RPC.height_off!r}'::DOUBLE
             + (CAST((doc_id * 13) % 41 AS DOUBLE) - 20.0) / 20.0
               * '{H_AMP!r}'::DOUBLE AS h
    FROM documents
"""


def _norm_sql(lon: str, lat: str, h: str) -> tuple[str, str, str]:
    """Normalized (P, L, H) expressions incl. the dateline CASE
    (RPCTransformPoint :369-386)."""
    d = f"({lon} - '{DEMO_RPC.long_off!r}'::DOUBLE)"
    p = (f"(CASE WHEN {d} < -270 THEN {d} + 360 "
         f"WHEN {d} > 270 THEN {d} - 360 ELSE {d} END)"
         f" / '{DEMO_RPC.long_scale!r}'::DOUBLE")
    ll = (f"({lat} - '{DEMO_RPC.lat_off!r}'::DOUBLE)"
          f" / '{DEMO_RPC.lat_scale!r}'::DOUBLE")
    hh = (f"({h} - '{DEMO_RPC.height_off!r}'::DOUBLE)"
          f" / '{DEMO_RPC.height_scale!r}'::DOUBLE")
    return p, ll, hh


#: term-slot SQL over columns named P, L, H (RPCComputeTerms order;
#: products left-associate exactly like the C and the Column code)
_TERM_SQL = (
    "1.0", "P", "L", "H", "P * L", "P * H", "L * H",
    "P * P", "L * L", "H * H",
    "P * L * H", "P * P * P", "P * L * L", "P * H * H", "P * P * L",
    "L * L * L", "L * H * H", "P * P * H", "L * L * H", "H * H * H",
)


def _poly_sql(coefs) -> str:
    """RPCEvaluate's two interleaved accumulators (:337-350): each
    SQL ``+`` chain left-associates, matching the serial loop."""
    s1 = " + ".join(f"t{i} * '{coefs[i]!r}'::DOUBLE" for i in range(0, 20, 2))
    s2 = " + ".join(f"t{i} * '{coefs[i]!r}'::DOUBLE" for i in range(1, 20, 2))
    return f"(({s1}) + ({s2}))"


def _fwd_tail_sql() -> tuple[str, str]:
    """(bx, by) expressions over term columns t0..t19."""
    bx = (f"{_poly_sql(DEMO_RPC.samp_num)} / {_poly_sql(DEMO_RPC.samp_den)}"
          f" * '{DEMO_RPC.samp_scale!r}'::DOUBLE"
          f" + '{DEMO_RPC.samp_off!r}'::DOUBLE + 0.5")
    by = (f"{_poly_sql(DEMO_RPC.line_num)} / {_poly_sql(DEMO_RPC.line_den)}"
          f" * '{DEMO_RPC.line_scale!r}'::DOUBLE"
          f" + '{DEMO_RPC.line_off!r}'::DOUBLE + 0.5")
    return bx, by


def _term_cols_sql() -> str:
    return ", ".join(f"{e} AS t{i}" for i, e in enumerate(_TERM_SQL))


def _fwd_scalar_sql(lon_lit: str, lat_lit: str, h_lit: str,
                    px_name: str, py_name: str) -> str:
    """One forward projection of CONSTANT inputs as a scalar CTE —
    used by the oracle to re-derive the reference-point affine."""
    p, ll, hh = _norm_sql(lon_lit, lat_lit, h_lit)
    bx, by = _fwd_tail_sql()
    return (f"(SELECT {bx} AS {px_name}, {by} AS {py_name} FROM "
            f"(SELECT {_term_cols_sql()} FROM "
            f"(SELECT {p} AS P, {ll} AS L, {hh} AS H)))")


def _seed_affine_sql() -> str:
    """Transformer creation in SQL (gdal_rpc.cpp:1040-1090 +
    GDALInvGeoTransform general path): emits a one-row relation
    ``ig(i0..i5)``.  DEMO_RPC's bounds differ from (-180, 180), so
    the reference point is the bounds midpoint — which equals the
    offsets here; ref_z = 0 (no DEM)."""
    ref_lon = (DEMO_RPC.min_long + DEMO_RPC.max_long) * 0.5
    ref_lat = (DEMO_RPC.min_lat + DEMO_RPC.max_lat) * 0.5
    lon_l = f"'{ref_lon!r}'::DOUBLE"
    lat_l = f"'{ref_lat!r}'::DOUBLE"
    lon_d = f"'{ref_lon + LL_DELTA!r}'::DOUBLE"
    lat_d = f"'{ref_lat + LL_DELTA!r}'::DOUBLE"
    z = "0.0"
    return f"""
    ref0 AS {_fwd_scalar_sql(lon_l, lat_l, z, 'rpx', 'rpy')},
    refx AS {_fwd_scalar_sql(lon_d, lat_l, z, 'xpx', 'xpy')},
    refy AS {_fwd_scalar_sql(lon_l, lat_d, z, 'ypx', 'ypy')},
    gt AS (
      SELECT (xpx - rpx) / '{LL_DELTA!r}'::DOUBLE AS g1,
             (xpy - rpy) / '{LL_DELTA!r}'::DOUBLE AS g4,
             (ypx - rpx) / '{LL_DELTA!r}'::DOUBLE AS g2,
             (ypy - rpy) / '{LL_DELTA!r}'::DOUBLE AS g5,
             rpx, rpy
      FROM ref0, refx, refy
    ),
    gt6 AS (
      SELECT g1, g2, g4, g5,
             rpx - g1 * {lon_l} - g2 * {lat_l} AS g0,
             rpy - g4 * {lon_l} - g5 * {lat_l} AS g3
      FROM gt
    ),
    ig AS (
      SELECT (g2 * g3 - g0 * g5) * (1.0 / (g1 * g5 - g2 * g4)) AS i0,
             g5 * (1.0 / (g1 * g5 - g2 * g4)) AS i1,
             -g2 * (1.0 / (g1 * g5 - g2 * g4)) AS i2,
             (-g1 * g3 + g0 * g4) * (1.0 / (g1 * g5 - g2 * g4)) AS i3,
             -g4 * (1.0 / (g1 * g5 - g2 * g4)) AS i4,
             g1 * (1.0 / (g1 * g5 - g2 * g4)) AS i5
      FROM gt6
    )"""


def _forward_oracle() -> str:
    p, ll, hh = _norm_sql("lon", "lat", "h")
    bx, by = _fwd_tail_sql()
    return f"""
    WITH pts AS ({_PTS_SQL}),
    n AS (SELECT doc_id, {p} AS P, {ll} AS L, {hh} AS H FROM pts),
    tm AS (SELECT doc_id, {_term_cols_sql()} FROM n)
    SELECT doc_id,
           CAST(FLOOR(({bx}) * '{PX_SCALE!r}'::DOUBLE + 0.5) AS BIGINT)
             AS spx,
           CAST(FLOOR(({by}) * '{PX_SCALE!r}'::DOUBLE + 0.5) AS BIGINT)
             AS spy
    FROM tm
    """


def _inverse_oracle() -> str:
    """Unrolled RPCInverseTransformPoint: seed through the
    SQL-derived affine, then MAX_ITERATIONS rounds of project /
    error / freeze-or-correct."""
    p, ll, hh = _norm_sql("X", "Y", "h")
    bx, by = _fwd_tail_sql()
    thr = f"'{PIX_ERR_THRESHOLD!r}'::DOUBLE"
    carry = "doc_id, px, py, h, i1, i2, i4, i5"
    steps = []
    for k in range(MAX_ITERATIONS):
        steps.append(f"""
    n{k} AS (SELECT *, {p} AS P, {ll} AS L, {hh} AS H FROM it{k}),
    tm{k} AS (SELECT *, {_term_cols_sql()} FROM n{k}),
    e{k} AS (SELECT {carry}, X, Y, conv,
                    ({bx}) - px AS dx, ({by}) - py AS dy FROM tm{k}),
    it{k + 1} AS (
      SELECT {carry},
             CASE WHEN conv OR GREATEST(ABS(dx), ABS(dy)) < {thr} THEN X
                  ELSE X - dx * i1 - dy * i2 END AS X,
             CASE WHEN conv OR GREATEST(ABS(dx), ABS(dy)) < {thr} THEN Y
                  ELSE Y - dx * i4 - dy * i5 END AS Y,
             conv OR GREATEST(ABS(dx), ABS(dy)) < {thr} AS conv
      FROM e{k}
    )""")
    return f"""
    WITH pts AS ({_PTS_SQL}),
    {_seed_affine_sql()},
    fn AS (SELECT doc_id, {p.replace('X', 'lon').replace('Y', 'lat')} AS P,
                  {ll.replace('Y', 'lat')} AS L, {hh} AS H,
                  h FROM pts),
    ftm AS (SELECT doc_id, h, {_term_cols_sql()} FROM fn),
    fpx AS (SELECT doc_id, h, ({bx}) AS px, ({by}) AS py FROM ftm),
    it0 AS (
      SELECT doc_id, px, py, h, i1, i2, i4, i5,
             i0 + i1 * px + i2 * py AS X,
             i3 + i4 * px + i5 * py AS Y,
             FALSE AS conv
      FROM fpx, ig
    ),{



        ','.join(steps)}
    SELECT doc_id,
           CASE WHEN conv THEN
             CAST(FLOOR(X * '{LL_SCALE!r}'::DOUBLE + 0.5) AS BIGINT)
           END AS slon,
           CASE WHEN conv THEN
             CAST(FLOOR(Y * '{LL_SCALE!r}'::DOUBLE + 0.5) AS BIGINT)
           END AS slat,
           conv AS converged
    FROM it{MAX_ITERATIONS}
    """


@register("rpc_forward", sql=_forward_oracle(),
          desc="RPC forward lonlat->pixel/line (RPCTransformPoint, "
               "gdal_rpc.cpp:358-466): 20-term rational Column math, "
               "bit-matched by a full SQL restatement")
def rpc_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    lon, lat, h = _lonlat_cols()
    pts = t(spark, sf_dir, "documents").select(
        "doc_id", lon.alias("lon"), lat.alias("lat"), h.alias("h"))
    out = rpc_forward(pts, DEMO_RPC, height_col="h")
    return out.select(
        "doc_id",
        F.floor(F.col("px") * F.lit(PX_SCALE) + F.lit(0.5))
        .cast("long").alias("spx"),
        F.floor(F.col("py") * F.lit(PX_SCALE) + F.lit(0.5))
        .cast("long").alias("spy"),
    )


@register("rpc_inverse", sql=_inverse_oracle(),
          desc="RPC inverse pixel/line->lonlat (RPCInverseTransformPoint, "
               "gdal_rpc.cpp:1128-1372, no-DEM): vectorized iterate/freeze "
               "in an Arrow batch; oracle re-derives even the seed affine "
               "(finite differences + GDALInvGeoTransform) in SQL and "
               "unrolls the 10-iteration loop as CTEs")
def rpc_inverse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    lon, lat, h = _lonlat_cols()
    pts = t(spark, sf_dir, "documents").select(
        "doc_id", lon.alias("lon"), lat.alias("lat"), h.alias("h"))
    fwd = rpc_forward(pts, DEMO_RPC, height_col="h") \
        .select("doc_id", "px", "py", "h")
    out = rpc_inverse(fwd, DEMO_RPC, height_col="h",
                      out_lon="ilon", out_lat="ilat")
    return out.select(
        "doc_id",
        F.floor(F.col("ilon") * F.lit(LL_SCALE) + F.lit(0.5))
        .cast("long").alias("slon"),
        F.floor(F.col("ilat") * F.lit(LL_SCALE) + F.lit(0.5))
        .cast("long").alias("slat"),
        F.col("converged"),
    )

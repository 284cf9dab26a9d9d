"""Transverse Mercator (UTM) forward/inverse as pure Column math.

The reference reprojects through PROJ's tmerc (OGRCoordinateTransformation,
/root/reference/ogr/ogrct.cpp:2264 array API; gdalwarp -t_srs EPSG:326xx).
PROJ's tmerc and the classic USGS series are both public math; this module
implements the Snyder series (Map Projections: A Working Manual, USGS
PP 1395, eqs. 8-9..8-25 — the same approximation family PROJ ships as
``tmerc approx``/Evenden-Snyder), accurate to sub-mm inside a UTM zone.

Spark-first shape: the projection is a CHAIN OF NAMED SCALAR STEPS
(phi, nn, tt, cc, aa, mm, x, y), each one SQL expression text.  The
SAME strings drive both engines:

* Spark: ``fold withColumn(name, F.expr(text))`` — everything stays
  inside whole-stage codegen, no UDF, vectorized over 10^12 rows;
* the DuckDB oracle: the steps render into a CTE chain
  (``SELECT *, <text> AS <name> FROM prev``).

So the formula structure is identical by construction; only the two
engines' libm trig can differ (ULPs), absorbed by rounding outputs to
mm / 1e-7 deg in both engines — the established catalog convention.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# WGS84 (the UTM default); Clarke 1866 kept for the Snyder worked example.
WGS84 = (6378137.0, 1.0 / 298.257223563)
CLARKE_1866 = (6378206.4, 1.0 - 6356583.8 / 6378206.4)

UTM_K0 = 0.9996
UTM_FE = 500000.0


def utm_lon0(zone: int) -> float:
    """Central meridian of a UTM zone, degrees (zone 1 = 177W..171W)."""
    return -183.0 + 6.0 * zone


def _mcoef(e2: float) -> tuple[float, float, float, float]:
    """Meridian-arc series coefficients (Snyder eq. 3-21)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0,
            3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0,
            15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0,
            35.0 * e6 / 3072.0)


def tmerc_forward_steps(lon_col: str, lat_col: str, lon0_deg: float,
                        ellps: tuple[float, float] = WGS84,
                        k0: float = UTM_K0, fe: float = UTM_FE,
                        fn: float = 0.0) -> list[tuple[str, str]]:
    """(name, sql_expr) steps computing UTM easting/northing ``tmx, tmy``
    from degree columns.  Snyder eqs. 4-20/4-21, 8-12..8-15, 3-21."""
    a, f = ellps
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    c0, c2, c4, c6 = _mcoef(e2)
    lam0 = math.radians(lon0_deg)
    return [
        ("phi", f"radians({lat_col})"),
        ("sphi", "sin(phi)"),
        ("cphi", "cos(phi)"),
        ("tphi", "tan(phi)"),
        # radius of curvature in the prime vertical (eq. 4-20)
        ("nn", f"{a!r} / sqrt(1.0 - {e2!r} * sphi * sphi)"),
        ("tt", "tphi * tphi"),
        ("cc", f"{ep2!r} * cphi * cphi"),
        ("aa", f"(radians({lon_col}) - {lam0!r}) * cphi"),
        # meridian arc from the equator (eq. 3-21)
        ("mm", f"{a!r} * ({c0!r} * phi - {c2!r} * sin(2.0 * phi)"
               f" + {c4!r} * sin(4.0 * phi) - {c6!r} * sin(6.0 * phi))"),
        # eq. 8-9
        ("tmx", f"{fe!r} + {k0!r} * nn * (aa"
                " + (1.0 - tt + cc) * aa * aa * aa / 6.0"
                f" + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc"
                f" - 58.0 * {ep2!r}) * pow(aa, 5.0) / 120.0)"),
        # eq. 8-10 (M0 = 0: zones reckon northing from the equator)
        ("tmy", f"{fn!r} + {k0!r} * (mm + nn * tphi * (aa * aa / 2.0"
                " + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc)"
                " * pow(aa, 4.0) / 24.0"
                f" + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc"
                f" - 330.0 * {ep2!r}) * pow(aa, 6.0) / 720.0))"),
    ]


def tmerc_inverse_steps(x_col: str, y_col: str, lon0_deg: float,
                        ellps: tuple[float, float] = WGS84,
                        k0: float = UTM_K0, fe: float = UTM_FE,
                        fn: float = 0.0) -> list[tuple[str, str]]:
    """(name, sql_expr) steps recovering degree columns ``tmlon, tmlat``
    from easting/northing.  Snyder eqs. 7-19, 3-24, 8-17..8-25."""
    a, f = ellps
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    c0, _, _, _ = _mcoef(e2)
    se = math.sqrt(1.0 - e2)
    e1 = (1.0 - se) / (1.0 + se)
    j2 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    j4 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    j6 = 151.0 * e1 ** 3 / 96.0
    j8 = 1097.0 * e1 ** 4 / 512.0
    lam0 = math.radians(lon0_deg)
    return [
        # footpoint latitude (eqs. 7-19, 3-26, 3-24); the divisor is
        # pre-folded in Python — engines must never evaluate
        # decimal-decimal literal arithmetic themselves (Spark folds
        # it in DECIMAL, DuckDB in its own decimal rules).
        ("mu", f"(({y_col}) - {fn!r}) / {k0 * a * c0!r}"),
        ("phi1", f"mu + {j2!r} * sin(2.0 * mu) + {j4!r} * sin(4.0 * mu)"
                 f" + {j6!r} * sin(6.0 * mu) + {j8!r} * sin(8.0 * mu)"),
        ("sphi1", "sin(phi1)"),
        ("cphi1", "cos(phi1)"),
        ("tphi1", "tan(phi1)"),
        ("cc1", f"{ep2!r} * cphi1 * cphi1"),
        ("tt1", "tphi1 * tphi1"),
        ("n1", f"{a!r} / sqrt(1.0 - {e2!r} * sphi1 * sphi1)"),
        # meridian radius of curvature (eq. 8-24); a*(1-e2) pre-folded
        ("r1", f"{a * (1.0 - e2)!r}"
               f" * pow(1.0 - {e2!r} * sphi1 * sphi1, -1.5)"),
        ("dd", f"(({x_col}) - {fe!r}) / (n1 * {k0!r})"),
        # eq. 8-17
        ("tmlat", "degrees(phi1 - (n1 * tphi1 / r1) * (dd * dd / 2.0"
                  " - (5.0 + 3.0 * tt1 + 10.0 * cc1 - 4.0 * cc1 * cc1"
                  f" - 9.0 * {ep2!r}) * pow(dd, 4.0) / 24.0"
                  " + (61.0 + 90.0 * tt1 + 298.0 * cc1 + 45.0 * tt1 * tt1"
                  f" - 252.0 * {ep2!r} - 3.0 * cc1 * cc1)"
                  " * pow(dd, 6.0) / 720.0))"),
        # eq. 8-18
        ("tmlon", f"degrees({lam0!r} + (dd"
                  " - (1.0 + 2.0 * tt1 + cc1) * dd * dd * dd / 6.0"
                  " + (5.0 - 2.0 * cc1 + 28.0 * tt1 - 3.0 * cc1 * cc1"
                  f" + 8.0 * {ep2!r} + 24.0 * tt1 * tt1)"
                  " * pow(dd, 5.0) / 120.0) / cphi1)"),
    ]


def apply_steps(df: DataFrame, steps: list[tuple[str, str]],
                keep: list[str]) -> DataFrame:
    """Fold the step chain into the plan (codegen scalar expressions),
    keeping ``keep`` plus the final step outputs."""
    for name, text in steps:
        df = df.withColumn(name, F.expr(text))
    return df.select(*keep)


def steps_to_cte(base_sql: str, steps: list[tuple[str, str]],
                 final_select: str) -> str:
    """Render the same step chain as a DuckDB CTE pipeline."""
    ctes = [f"s0 AS ({base_sql})"]
    for i, (name, text) in enumerate(steps):
        ctes.append(f"s{i + 1} AS (SELECT *, {text} AS {name} FROM s{i})")
    return f"WITH {', '.join(ctes)} {final_select.format(last=f's{len(steps)}')}"


def utm_forward(df: DataFrame, lon_col: str, lat_col: str, zone: int,
                ellps: tuple[float, float] = WGS84,
                south: bool = False) -> DataFrame:
    """Project lon/lat degree columns to UTM zone easting/northing
    (appends ``tmx``/``tmy``) — pure Column math, zero UDFs.

    ``south=True`` applies the southern-hemisphere 10,000,000 m false
    northing (EPSG:327xx), matching ST_Transform's handling."""
    fn = 10_000_000.0 if south else 0.0
    steps = tmerc_forward_steps(lon_col, lat_col, utm_lon0(zone), ellps,
                                fn=fn)
    return apply_steps(df, steps, keep=[*df.columns, "tmx", "tmy"])


def utm_inverse(df: DataFrame, x_col: str, y_col: str, zone: int,
                ellps: tuple[float, float] = WGS84,
                south: bool = False) -> DataFrame:
    """Inverse-project UTM easting/northing columns back to degrees
    (appends ``tmlon``/``tmlat``)."""
    fn = 10_000_000.0 if south else 0.0
    steps = tmerc_inverse_steps(x_col, y_col, utm_lon0(zone), ellps,
                                fn=fn)
    return apply_steps(df, steps, keep=[*df.columns, "tmlon", "tmlat"])

"""Focal (3x3 neighborhood) kernels: hillshade, slope, aspect, TPI,
TRI, roughness — numpy, vectorized over whole arrays.

Semantics follow gdaldem (/root/reference/apps/gdaldem_lib.cpp):
Horn gradient (GradientAlg::HORN, :170; window layout afWin[0..8]
rows top->bottom), slope/aspect from the gradient, TPI = center -
neighbor mean, TRI = mean |center - neighbor| (Wilson), roughness =
window max - min.  Hillshade composes the Horn gradient with the
standard illumination formula (GDALHillshadeAlg :1003-1029; the
reference's ApproxADivByInvSqrtB fast-inverse-sqrt is replaced by an
exact sqrt — semantics-parity, not bit-parity, documented).

Edges: a NaN halo ring, so outputs at array edges are NaN (the
reference leaves edges nodata unless -compute_edges).  The
distributed operator supplies real neighbor data via halo exchange,
making per-tile results equal the single-array result away from the
GLOBAL edge — the tile-split invariance tests assert exactly that.
"""

from __future__ import annotations

import numpy as np


def _pad_nan(a):
    h, w = a.shape
    p = np.full((h + 2, w + 2), np.nan, dtype=np.float64)
    p[1:-1, 1:-1] = a
    return p


def _window(p):
    """The 9 shifted views of a padded array, afWin order:
    0 1 2 / 3 4 5 / 6 7 8 (row-major, top row first)."""
    return [
        p[0:-2, 0:-2], p[0:-2, 1:-1], p[0:-2, 2:],
        p[1:-1, 0:-2], p[1:-1, 1:-1], p[1:-1, 2:],
        p[2:, 0:-2], p[2:, 1:-1], p[2:, 2:],
    ]


def horn_gradient(padded, ewres: float, nsres: float):
    """(dz/dx, dz/dy), Horn weights — gdaldem_lib.cpp HORN calc."""
    w = _window(padded)
    x = ((w[0] + 2 * w[3] + w[6]) - (w[2] + 2 * w[5] + w[8])) / (8.0 * ewres)
    y = ((w[0] + 2 * w[1] + w[2]) - (w[6] + 2 * w[7] + w[8])) / (8.0 * nsres)
    return x, y


def hillshade(padded, ewres: float, nsres: float, z: float = 1.0,
              azimuth: float = 315.0, altitude: float = 45.0):
    """Byte hillshade 1..255 (0 reserved), gdaldem hillshade formula."""
    x, y = horn_gradient(padded, ewres, nsres)
    az = np.radians(azimuth)
    alt = np.radians(altitude)
    xx_plus_yy = x * x + y * y
    num = (np.sin(alt) -
           (y * np.cos(az) * np.cos(alt) * z - x * np.sin(az) * np.cos(alt) * z))
    cang = num / np.sqrt(1 + z * z * xx_plus_yy)
    out = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return out


def slope_degrees(padded, ewres: float, nsres: float):
    x, y = horn_gradient(padded, ewres, nsres)
    return np.degrees(np.arctan(np.sqrt(x * x + y * y)))


def aspect_degrees(padded, ewres: float = 1.0, nsres: float = 1.0):
    """Aspect in degrees clockwise from north (gdaldem convention)."""
    x, y = horn_gradient(padded, ewres, nsres)
    asp = np.degrees(np.arctan2(y, -x))
    asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    flat = (x == 0) & (y == 0)
    return np.where(flat, np.nan, asp)


def tpi(padded):
    w = _window(padded)
    nb = (w[0] + w[1] + w[2] + w[3] + w[5] + w[6] + w[7] + w[8]) / 8.0
    return w[4] - nb


def tri(padded):
    w = _window(padded)
    c = w[4]
    s = sum(np.abs(c - w[i]) for i in (0, 1, 2, 3, 5, 6, 7, 8))
    return s / 8.0


def roughness(padded):
    w = _window(padded)
    return np.nanmax(np.stack(w), axis=0) - np.nanmin(np.stack(w), axis=0)


def zt_gradient(padded, ewres: float, nsres: float):
    """(dz/dx, dz/dy), Zevenbergen-Thorne — gdaldem_lib.cpp:795-803
    (z_factor = z/2 folded into the denominator, as /8 is for Horn)."""
    w = _window(padded)
    x = (w[3] - w[5]) / (2.0 * ewres)
    y = (w[1] - w[7]) / (2.0 * nsres)
    return x, y


def slope_degrees_zt(padded, ewres: float, nsres: float):
    x, y = zt_gradient(padded, ewres, nsres)
    return np.degrees(np.arctan(np.sqrt(x * x + y * y)))


def aspect_degrees_zt(padded, ewres: float = 1.0, nsres: float = 1.0):
    x, y = zt_gradient(padded, ewres, nsres)
    asp = np.degrees(np.arctan2(y, -x))
    asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    flat = (x == 0) & (y == 0)
    return np.where(flat, np.nan, asp)


def hillshade_zt(padded, ewres: float, nsres: float, z: float = 1.0,
                 azimuth: float = 315.0, altitude: float = 45.0):
    """gdaldem hillshade -alg ZevenbergenThorne (same illumination
    formula over the ZT gradient, z_factor = z/2)."""
    x, y = zt_gradient(padded, ewres, nsres)
    az, alt = np.radians(azimuth), np.radians(altitude)
    num = (np.sin(alt) -
           (y * np.cos(az) * np.cos(alt) * z - x * np.sin(az) * np.cos(alt) * z))
    cang = num / np.sqrt(1 + z * z * (x * x + y * y))
    return np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)


def hillshade_combined(padded, ewres: float, nsres: float, z: float = 1.0,
                       azimuth: float = 315.0, altitude: float = 45.0):
    """gdaldem hillshade -combined (GDALHillshadeCombinedAlg,
    gdaldem_lib.cpp:1139-1167): shade angle times slope steepness."""
    x, y = horn_gradient(padded, ewres, nsres)
    az, alt = np.radians(azimuth), np.radians(altitude)
    slope = z * z * (x * x + y * y)
    num = (np.sin(alt) -
           (y * np.cos(az) * np.cos(alt) * z - x * np.sin(az) * np.cos(alt) * z))
    cang = np.arccos(np.clip(num / np.sqrt(1 + slope), -1.0, 1.0))
    inv_sq_half_pi = 1.0 / ((np.pi * np.pi) / 4.0)
    cang = 1.0 - cang * np.arctan(np.sqrt(slope)) * inv_sq_half_pi
    return np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)


def hillshade_multidirectional(padded, ewres: float, nsres: float,
                               z: float = 1.0, altitude: float = 45.0):
    """gdaldem hillshade -multidirectional
    (GDALHillshadeMultiDirectionalAlg, gdaldem_lib.cpp:1237-1296;
    USGS OF 92-422 weights over azimuths 225/270/315/360)."""
    x, y = horn_gradient(padded, ewres, nsres)
    alt = np.radians(altitude)
    sin_alt_127 = 127.0 * np.sin(alt)
    cos_alt_z_127 = 127.0 * np.cos(alt) * z
    cos225_127 = np.cos(np.radians(225.0)) * cos_alt_z_127
    xx, yy = x * x, y * y
    xx_plus_yy = xx + yy
    v225 = np.maximum(0.0, sin_alt_127 + (x - y) * cos225_127)
    v270 = np.maximum(0.0, sin_alt_127 - x * cos_alt_z_127)
    v315 = np.maximum(0.0, sin_alt_127 + (x + y) * cos225_127)
    v360 = np.maximum(0.0, sin_alt_127 - y * cos_alt_z_127)
    w225 = 0.5 * xx_plus_yy - x * y
    w270 = xx
    w315 = xx_plus_yy - w225
    w360 = yy
    with np.errstate(invalid="ignore", divide="ignore"):
        cang = ((w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360)
                / xx_plus_yy) / np.sqrt(1 + z * z * xx_plus_yy)
    out = 1.0 + cang
    return np.where(xx_plus_yy == 0.0, 1.0 + 2.0 * sin_alt_127, out)


def hillshade_igor(padded, ewres: float, nsres: float, z: float = 1.0,
                   azimuth: float = 315.0):
    """gdaldem hillshade -igor (GDALHillshadeIgorAlg,
    gdaldem_lib.cpp:942-1000): shadowness from slope strength times
    aspect alignment; aspect uses RAW window sums (no res scaling),
    exactly as the reference."""
    w = _window(padded)
    x, y = horn_gradient(padded, ewres, nsres)
    slope_deg = np.degrees(np.arctan(np.sqrt(x * x + y * y) * z))
    dx = (w[2] + 2 * w[5] + w[8]) - (w[0] + 2 * w[3] + w[6])
    dy2 = (w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])
    aspect = np.arctan2(dy2, -dx)
    two_pi = 2.0 * np.pi
    n1 = np.mod(aspect, two_pi)
    n2 = np.mod(np.pi * 1.5 - np.radians(azimuth), two_pi)
    diff = np.abs(n1 - n2)
    diff = np.where(diff > np.pi, two_pi - diff, diff)
    aspect_strength = 1.0 - diff / np.pi
    shadowness = 1.0 - (slope_deg / 90.0) * aspect_strength
    return 255.0 * shadowness


KERNELS = {
    "hillshade": lambda p, ew, ns: hillshade(p, ew, ns),
    "hillshade_zt": lambda p, ew, ns: hillshade_zt(p, ew, ns),
    "hillshade_combined": lambda p, ew, ns: hillshade_combined(p, ew, ns),
    "hillshade_multidirectional":
        lambda p, ew, ns: hillshade_multidirectional(p, ew, ns),
    "hillshade_igor": lambda p, ew, ns: hillshade_igor(p, ew, ns),
    "slope": slope_degrees,
    "slope_zt": slope_degrees_zt,
    "aspect": aspect_degrees,
    "aspect_zt": aspect_degrees_zt,
    "tpi": lambda p, ew, ns: tpi(p),
    "tri": lambda p, ew, ns: tri(p),
    "roughness": lambda p, ew, ns: roughness(p),
}


def focal_array(arr, kernel: str, ewres: float = 1.0, nsres: float = 1.0):
    """Single-array reference path: pad with NaN, apply kernel."""
    return KERNELS[kernel](_pad_nan(np.asarray(arr, dtype=np.float64)),
                           ewres, nsres)

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


KERNELS = {
    "hillshade": lambda p, ew, ns: hillshade(p, ew, ns),
    "slope": slope_degrees,
    "aspect": aspect_degrees,
    "tpi": lambda p, ew, ns: tpi(p),
    "tri": lambda p, ew, ns: tri(p),
    "roughness": lambda p, ew, ns: roughness(p),
}


def focal_array(arr, kernel: str, ewres: float = 1.0, nsres: float = 1.0):
    """Single-array reference path: pad with NaN, apply kernel."""
    return KERNELS[kernel](_pad_nan(np.asarray(arr, dtype=np.float64)),
                           ewres, nsres)

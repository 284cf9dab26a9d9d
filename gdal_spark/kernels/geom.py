"""Scalar geometry kernels: area, orientation, centroid, distance.

* Shoelace area / orientation follow OGRLinearRing semantics:
  signed area sign test == isClockwise
  (/root/reference/ogr/ogrcurve.cpp:736); get_Area returns the
  absolute value (OGR_GEOM_AREA special field,
  /root/reference/ogr/ogr_p.h:167-174).
* Distance: Euclidean point/point and point/segment, the building
  blocks of Distance (/root/reference/ogr/ogrgeometry.cpp:3564) for
  the point/line/polygon subset we support.
* Web-Mercator <-> lon/lat: the standard spherical formulas backing
  EPSG:3857, the only CRS pair v1 supports (SURVEY.md non-goals).
"""

from __future__ import annotations

import numpy as np

_R = 6378137.0  # WGS84 semi-major axis used by spherical mercator


def ring_signed_area(ring_xy):
    """Signed shoelace area; negative == clockwise (screen-up coords)."""
    r = np.asarray(ring_xy, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def is_clockwise(ring_xy) -> bool:
    return ring_signed_area(ring_xy) < 0


def polygon_area(rings) -> float:
    """|outer| - sum(|holes|), OGRPolygon::get_Area semantics."""
    if not rings:
        return 0.0
    area = abs(ring_signed_area(rings[0]))
    for hole in rings[1:]:
        area -= abs(ring_signed_area(hole))
    return area


def ring_centroid(ring_xy):
    """Area-weighted centroid of a closed ring."""
    r = np.asarray(ring_xy, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    a = cross.sum() / 2.0
    if a == 0.0:
        return float(x.mean()), float(y.mean())
    cx = float(((x[:-1] + x[1:]) * cross).sum() / (6.0 * a))
    cy = float(((y[:-1] + y[1:]) * cross).sum() / (6.0 * a))
    return cx, cy


def point_segment_dist2(px, py, ax, ay, bx, by):
    """Vectorized squared distance from points to one segment."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    if ll == 0.0:
        return (px - ax) ** 2 + (py - ay) ** 2
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / ll, 0.0, 1.0)
    qx, qy = ax + t * dx, ay + t * dy
    return (px - qx) ** 2 + (py - qy) ** 2


def bbox_intersects(a, b) -> bool:
    """Envelope overlap — the pessimistic phase-1 test
    (ogr_wkb.h:36 OGRWKBIntersectsPessimistic role)."""
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def lonlat_to_mercator(lon, lat):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x = _R * np.radians(lon)
    y = _R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x, y):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = np.degrees(x / _R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
    return lon, lat

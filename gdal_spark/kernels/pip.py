"""Point-in-polygon kernels: ray casting + winding number, vectorized.

Ray cast reproduces OGRLinearRing::isPointInRing
(/root/reference/ogr/ogrlinearring.cpp:462-532) arithmetic exactly:
coordinates are translated relative to the test point, a crossing is
counted when the edge straddles y=0 with the strict/inclusive split
``(y1>0 && y2<=0) || (y2>0 && y1<=0)`` and the ray intersection
``(x1*y2 - x2*y1)/(y2-y1)`` is strictly > 0.  Same IEEE double ops in
the same order -> bit-identical inside/outside decisions, including
the reference's edge-case behavior for points on vertices/edges.

Winding number mirrors the ring-nesting test of the marching-squares
polygonizer (/root/reference/alg/marching_squares/
polygon_ring_appender.h:50-87), used for hole assignment.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px, py, ring_xy, test_envelope=True):
    """Vectorized ray-cast test of N points against one ring.

    px, py : float64 arrays (N,)
    ring_xy: float64 array (M, 2) — ring vertices; the reference
             requires an explicitly closed ring (first == last) and
             >= 4 points (ogrlinearring.cpp:478-481), which we assert.
    Returns bool array (N,): True == inside (odd crossings).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring_xy, dtype=np.float64)
    m = ring.shape[0]
    if m < 4:
        return np.zeros(px.shape, dtype=bool)

    # Relative coords: (M, 1) vs (N,) broadcast -> (M, N) per-edge work.
    rx = ring[:, 0][:, None] - px[None, :]
    ry = ring[:, 1][:, None] - py[None, :]

    # Edge i: from vertex i (x2,y2=prev) to vertex i+1 (x1,y1) — the
    # reference iterates iPoint=1..M-1 with prev as vertex iPoint-1.
    x1, y1 = rx[1:], ry[1:]
    x2, y2 = rx[:-1], ry[:-1]

    straddle = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        inter = (x1 * y2 - x2 * y1) / (y2 - y1)
    crossing = straddle & (inter > 0.0)
    inside = (crossing.sum(axis=0) % 2).astype(bool)

    if test_envelope:
        # Envelope pretest (ogrlinearring.cpp:487-497): points outside
        # the ring bbox are outside, short-circuiting the ray cast.
        minx, miny = ring.min(axis=0)
        maxx, maxy = ring.max(axis=0)
        in_env = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
        inside &= in_env
    return inside


def points_in_polygon(px, py, rings):
    """Test points against a polygon = [outer_ring, hole1, ...].

    OGR polygon semantics: inside the outer ring and inside an even
    number of hole rings (each ring flips membership under even-odd).
    """
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def winding_number(px, py, ring_xy):
    """Vectorized winding number of N points w.r.t. one ring.

    Mirrors polygon_ring_appender.h:50-87: signed crossings of the
    upward/downward edges using the isLeft orientation test.  Nonzero
    winding == inside; used for polygonize hole nesting, not for the
    bit-match PIP path.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring_xy, dtype=np.float64)

    x1, y1 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
    x2, y2 = ring[1:, 0][:, None], ring[1:, 1][:, None]
    # isLeft((x1,y1),(x2,y2),p) > 0 <=> p left of upward edge
    is_left = (x2 - x1) * (py[None, :] - y1) - (px[None, :] - x1) * (y2 - y1)
    up = (y1 <= py[None, :]) & (y2 > py[None, :]) & (is_left > 0)
    down = (y1 > py[None, :]) & (y2 <= py[None, :]) & (is_left < 0)
    return (up.sum(axis=0) - down.sum(axis=0)).astype(np.int64)


def envelope_of_ring(ring_xy):
    """(minx, miny, maxx, maxy) of a ring, as plain floats."""
    ring = np.asarray(ring_xy, dtype=np.float64)
    mn = ring.min(axis=0)
    mx = ring.max(axis=0)
    return float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1])

"""Scanline rasterization kernels.

Reproduces the reference burn semantics:

* polygon fill: pixel-center even-odd rule with round-half-up
  intersection snapping and separate bottom-horizontal-segment fill
  (/root/reference/alg/llrasterize.cpp:58-230; center rule comment
  :40-46);
* line burn: integer Bresenham on floor()ed endpoints, intermediate
  segment endpoints burned once (:255-368);
* point burn: floor() cell (:232-253);
* MERGE_ALG REPLACE vs ADD
  (/root/reference/alg/gdalrasterize.cpp:800-818).

Coordinates are in *pixel space*: world coords are first mapped
through the inverse geotransform (gdalrasterize.cpp does the same
before calling the ll kernels).
"""

from __future__ import annotations

import math

import numpy as np

MERGE_REPLACE = "REPLACE"
MERGE_ADD = "ADD"


def _burn_span(img, y, x0, x1, value, merge):
    """Burn [x0, x1] inclusive on row y, clipped to the image."""
    h, w = img.shape
    if y < 0 or y >= h:
        return
    x0 = max(x0, 0)
    x1 = min(x1, w - 1)
    if x0 > x1:
        return
    if merge == MERGE_ADD:
        img[y, x0:x1 + 1] += value
    else:
        img[y, x0:x1 + 1] = value


def fill_polygon(img, rings_px, value, merge=MERGE_REPLACE):
    """Even-odd scanline fill of a multi-ring polygon, in place.

    rings_px: list of (M,2) float arrays in pixel coords (x right,
    y down, pixel (0,0) spans [0,1)x[0,1)).  Rings need not be closed
    (llrasterize.cpp wraps the last vertex to the first).  Closed
    rings (first == last) are handled identically: the wrap segment is
    degenerate and contributes nothing.
    """
    h, w = img.shape
    rings = [np.asarray(r, dtype=np.float64) for r in rings_px if len(r)]
    if not rings:
        return
    ys = np.concatenate([r[:, 1] for r in rings])
    miny = max(int(ys.min()), 0)
    maxy = min(int(ys.max()), h - 1)
    minx, maxx = 0, w - 1

    for y in range(miny, maxy + 1):
        dy = y + 0.5  # pixel-center scanline
        xs = []
        horiz = []
        for ring in rings:
            n = ring.shape[0]
            for i in range(n):
                i1 = n - 1 if i == 0 else i - 1
                dy1, dy2 = ring[i1, 1], ring[i, 1]
                if (dy1 < dy and dy2 < dy) or (dy1 > dy and dy2 > dy):
                    continue
                if dy1 < dy2:
                    dx1, dx2 = ring[i1, 0], ring[i, 0]
                elif dy1 > dy2:
                    dy1, dy2 = dy2, dy1
                    dx1, dx2 = ring[i, 0], ring[i1, 0]
                else:
                    # bottom horizontal segments fill separately;
                    # top horizontals are covered by the regular rule
                    if ring[i1, 0] > ring[i, 0]:
                        hx1 = int(math.floor(ring[i, 0] + 0.5))
                        hx2 = int(math.floor(ring[i1, 0] + 0.5))
                        if hx1 > maxx or hx2 <= minx:
                            continue
                        horiz.append((hx1, hx2))
                    continue
                if dy1 <= dy < dy2:
                    inter = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
                    xs.append(int(math.floor(inter + 0.5)))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            if xs[i] <= maxx and xs[i + 1] > minx:
                _burn_span(img, y, xs[i], xs[i + 1] - 1, value, merge)
        horiz.sort()
        i = 0
        for hx1, hx2 in horiz:
            if hx1 <= maxx and hx2 > minx:
                while i + 1 < len(xs) and xs[i] < hx1:
                    i += 2
                if i + 1 >= len(xs) or xs[i] != hx1:
                    _burn_span(img, y, hx1, hx2 - 1, value, merge)


def burn_line(img, coords_px, value, merge=MERGE_REPLACE):
    """Bresenham burn of a linestring, llrasterize.cpp:255-368 semantics:
    endpoints floor()ed; intermediate vertices burned once (the end
    point of a non-final segment is skipped to avoid double ADD)."""
    h, w = img.shape
    pts = np.asarray(coords_px, dtype=np.float64)
    nseg = pts.shape[0] - 1

    def burn(yy, xx):
        if 0 <= xx < w and 0 <= yy < h:
            if merge == MERGE_ADD:
                img[yy, xx] += value
            else:
                img[yy, xx] = value

    for j in range(1, nseg + 1):
        ix = int(math.floor(pts[j - 1, 0]))
        iy = int(math.floor(pts[j - 1, 1]))
        ix1 = int(math.floor(pts[j, 0]))
        iy1 = int(math.floor(pts[j, 1]))
        dx_n = abs(ix1 - ix)
        dy_n = abs(iy1 - iy)
        xstep = -1 if ix > ix1 else 1
        ystep = -1 if iy > iy1 else 1
        if dx_n >= dy_n:
            xerr = dy_n << 1
            yerr = xerr - (dx_n << 1)
            err = xerr - dx_n
            if j != nseg:
                dx_n -= 1
            while dx_n >= 0:
                burn(iy, ix)
                ix += xstep
                if err > 0:
                    iy += ystep
                    err += yerr
                else:
                    err += xerr
                dx_n -= 1
        else:
            xerr = dx_n << 1
            yerr = xerr - (dy_n << 1)
            err = xerr - dy_n
            if j != nseg:
                dy_n -= 1
            while dy_n >= 0:
                burn(iy, ix)
                iy += ystep
                if err > 0:
                    ix += xstep
                    err += yerr
                else:
                    err += xerr
                dy_n -= 1


def burn_points(img, coords_px, value, merge=MERGE_REPLACE):
    """Point burn: floor() cell, llrasterize.cpp:232-253."""
    h, w = img.shape
    pts = np.asarray(coords_px, dtype=np.float64)
    for x, y in pts:
        ix, iy = int(math.floor(x)), int(math.floor(y))
        if 0 <= ix < w and 0 <= iy < h:
            if merge == MERGE_ADD:
                img[iy, ix] += value
            else:
                img[iy, ix] = value


def burn_line_all_touched(img, coords_px, value, merge=MERGE_REPLACE):
    """ALL_TOUCHED line burn: every pixel the segment passes through.

    Semantics target of GDALdllImageLineAllTouched
    (llrasterize.cpp:393+): conservative DDA grid traversal; a pixel
    is burned when the segment intersects its interior.  Used for the
    ALL_TOUCHED=TRUE rasterize option (gdalrasterize.cpp:779) where
    the boundary of a polygon is traced with this kernel in addition
    to the interior fill.
    """
    pts = np.asarray(coords_px, dtype=np.float64)
    h, w = img.shape

    def burn(yy, xx):
        if 0 <= xx < w and 0 <= yy < h:
            if merge == MERGE_ADD:
                img[yy, xx] += value
            else:
                img[yy, xx] = value

    for j in range(1, pts.shape[0]):
        x0, y0 = pts[j - 1]
        x1, y1 = pts[j]
        ix, iy = int(math.floor(x0)), int(math.floor(y0))
        ix1, iy1 = int(math.floor(x1)), int(math.floor(y1))
        burn(iy, ix)
        dx, dy = x1 - x0, y1 - y0
        sx = 1 if dx > 0 else -1
        sy = 1 if dy > 0 else -1
        tmax_x = math.inf if dx == 0 else ((ix + (sx > 0)) - x0) / dx
        tmax_y = math.inf if dy == 0 else ((iy + (sy > 0)) - y0) / dy
        tdx = math.inf if dx == 0 else abs(1.0 / dx)
        tdy = math.inf if dy == 0 else abs(1.0 / dy)
        # traverse until we reach the end cell (bounded for safety)
        for _ in range(4 * (abs(ix1 - ix) + abs(iy1 - iy)) + 8):
            if ix == ix1 and iy == iy1:
                break
            if tmax_x < tmax_y:
                ix += sx
                tmax_x += tdx
            else:
                iy += sy
                tmax_y += tdy
            burn(iy, ix)


def rasterize_geometry(img, gtype, payload_px, value, merge=MERGE_REPLACE,
                       all_touched=False):
    """Dispatch one parsed geometry (pixel-space payload) onto img."""
    from .wkb import LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT, POLYGON

    if gtype == POINT:
        burn_points(img, [payload_px], value, merge)
    elif gtype == MULTIPOINT:
        burn_points(img, payload_px, value, merge)
    elif gtype == LINESTRING:
        (burn_line_all_touched if all_touched else burn_line)(
            img, payload_px, value, merge)
    elif gtype == MULTILINESTRING:
        for part in payload_px:
            (burn_line_all_touched if all_touched else burn_line)(
                img, part, value, merge)
    elif gtype == POLYGON:
        fill_polygon(img, payload_px, value, merge)
        if all_touched:
            for ring in payload_px:
                burn_line_all_touched(img, ring, value, merge)
    elif gtype == MULTIPOLYGON:
        for rings in payload_px:
            fill_polygon(img, rings, value, merge)
            if all_touched:
                for ring in rings:
                    burn_line_all_touched(img, ring, value, merge)
    else:
        raise ValueError(f"cannot rasterize geometry type {gtype}")


def world_to_pixel(coords, geotransform):
    """Apply the inverse of a north-up geotransform
    (x0, resx, 0, y0, 0, -resy) to (N,2) world coords -> pixel coords."""
    x0, resx, _, y0, _, nresy = geotransform
    c = np.asarray(coords, dtype=np.float64)
    out = np.empty_like(c)
    out[..., 0] = (c[..., 0] - x0) / resx
    out[..., 1] = (c[..., 1] - y0) / nresy
    return out

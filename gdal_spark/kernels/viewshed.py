"""Viewshed + line-of-sight kernels (pure numpy/python, serial per
observer — distribution happens ACROSS observers in the operator).

Faithful transcriptions of the reference algorithms:

* ``viewshed``: the Wang-et-al reference-plane sweep of
  /root/reference/alg/viewshed/viewshed_executor.cpp — lines processed
  outward from the observer row, each cell's minimum visible height
  derived from its one/two already-processed neighbors toward the
  observer (CalcHeightLine :52, CalcHeightDiagonal :63, CalcHeightEdge
  :72, cell-mode dispatch doEdge/doDiagonal/doMin/doMax :77-106,
  setOutput max-propagation :179-192, per-line recurrence
  processLineLeft/Right :687-830).  Heights are normalized to the
  observer (adjustHeight :244): with curvature enabled each cell is
  lowered by ``heightAdjFactor * r^2`` where ``heightAdjFactor =
  curve_coeff / (2 * semi_major)`` (calcHeightAdjFactor :150-171) and
  r^2 is the geotransform ground distance squared (:280-316).  Output
  modes (setOutput :179-192): Normal writes visible/invisible from
  ``cell + target_height >= minimum visible height``; DEM/Ground
  write ``max(0, base + (min_visible - cell))`` where base is the raw
  pre-adjustment DEM value (DEM mode, processLine :849-850) or zero
  (Ground mode) — i.e. the absolute elevation / added height needed
  for visibility.  ``max_distance`` marks cells with r^2 >
  max_distance^2 as ``out_of_range`` (adjustHeight LineLimits
  :286-292; a post-mask is faithful because every in-range cell's
  recurrence inputs lie closer to the observer and are thus in
  range).

* ``line_of_sight``: GDALIsLineOfSightVisible
  (/root/reference/alg/los.cpp:136-370): endpoint pre-checks, exact
  vertical/horizontal scans, otherwise Bresenham2D (:37-108) with the
  interpolated test height lerp(zA, zB, sqrt(r2/R2)) (:330-346);
  z must be STRICTLY above terrain (IsAboveTerrain :120-133).
"""

from __future__ import annotations

import math

import numpy as np


def calc_height_line(n: int, za: float) -> float:
    n = abs(n)
    return za * n / (n - 1)


def calc_height_diagonal(i: int, j: int, za: float, zb: float) -> float:
    return (za * i + zb * j) / (i + j - 1)


def calc_height_edge(i: int, j: int, za: float, zb: float) -> float:
    return (za * i + zb * (j - i)) / (j - 1)


def _zcalc(mode: str, nx: int, ny: int, this_prev: float, last: float,
           last_prev: float) -> float:
    """doEdge/doDiagonal/doMin/doMax dispatch (viewshed_executor.cpp:
    77-106); args mirror oZcalc(nXOffset, nYOffset, *(pThis+-1),
    *pLast, *(pLast+-1)) with 'prev' = toward the observer."""
    if mode == "edge" or mode in ("min", "max"):
        if nx >= ny:
            edge = calc_height_edge(ny, nx, last_prev, this_prev)
        else:
            edge = calc_height_edge(nx, ny, last_prev, last)
        if mode == "edge":
            return edge
    diag = calc_height_diagonal(nx, ny, this_prev, last)
    if mode == "diagonal":
        return diag
    return min(edge, diag) if mode == "min" else max(edge, diag)


def viewshed(dem: np.ndarray, ox: int, oy: int, observer_z: float = 0.0,
             target_height: float = 0.0, cell_mode: str = "edge",
             visible: int = 255, invisible: int = 0,
             out_mode: str = "normal", curve_coeff: float = 0.0,
             semi_major: float = 6378137.0, cell_sx: float = 1.0,
             cell_sy: float = 1.0, max_distance: float = 0.0,
             out_of_range: float = 0.0,
             _force_generic: bool = False) -> np.ndarray:
    """Viewshed for one observer at pixel (ox, oy) inside ``dem``;
    observer height = dem[oy, ox] + observer_z.

    out_mode: "normal" (uint8 visible/invisible mask), "dem" (float64
    absolute elevation needed for visibility) or "ground" (float64
    height to add to the cell for visibility).  curve_coeff enables
    the curved-earth adjustment (GDAL's refraction-corrected default
    is 0.85714); cell_sx/cell_sy are the geotransform pixel sizes that
    turn pixel offsets into ground distance.  max_distance > 0 masks
    cells beyond that ground distance with ``out_of_range``."""
    if out_mode not in ("normal", "dem", "ground"):
        raise ValueError(f"unknown output mode {out_mode!r}")
    h_rows, w_cols = dem.shape
    if not (0 <= ox < w_cols and 0 <= oy < h_rows):
        raise ValueError("observer must be inside the DEM window")
    zobs = float(dem[oy, ox]) + observer_z
    normal = out_mode == "normal"
    if normal:
        out = np.full((h_rows, w_cols), invisible, dtype=np.float64)
    elif out_mode == "dem":
        out = dem.astype(np.float64).copy()
    else:
        out = np.zeros((h_rows, w_cols), dtype=np.float64)
    th = target_height
    adj = (curve_coeff / (2.0 * semi_major)) if curve_coeff else 0.0
    _dx2 = (cell_sx * (np.arange(w_cols, dtype=np.float64) - ox)) ** 2

    def norm_line(y: int) -> np.ndarray:
        """adjustHeight: normalize a DEM line to the observer, with
        the curvature term when enabled (viewshed_executor.cpp:
        280-316 / 318-328)."""
        h = dem[y].astype(np.float64) - zobs
        if adj:
            h -= adj * (_dx2 + (cell_sy * (y - oy)) ** 2)
        return h

    def setout(y: int, x: int, cellval: float, z: float) -> float:
        """setOutput (:179-192): write the result cell, return the
        max-propagated cell value."""
        if normal:
            out[y, x] = invisible if cellval + th < z else visible
        else:
            out[y, x] = max(0.0, out[y, x] + (z - cellval))
        return max(cellval, z)

    def first_line() -> list:
        hline = norm_line(oy).tolist()
        if normal:
            out[oy, ox] = visible
        # else: observer cell keeps its base (raw DEM / 0) —
        # processFirstLine :376 only writes visibleVal in Normal mode
        # left (processFirstLineLeft): adjacent cell always visible
        if ox - 1 >= 0:
            if normal:
                out[oy, ox - 1] = visible
            else:
                hline[ox - 1] = setout(oy, ox - 1, hline[ox - 1],
                                       hline[ox - 1])
            for x in range(ox - 2, -1, -1):
                z = calc_height_line(ox - x, hline[x + 1])
                hline[x] = setout(oy, x, hline[x], z)
        if ox + 1 < w_cols:
            if normal:
                out[oy, ox + 1] = visible
            else:
                hline[ox + 1] = setout(oy, ox + 1, hline[ox + 1],
                                       hline[ox + 1])
            for x in range(ox + 2, w_cols):
                z = calc_height_line(x - ox, hline[x - 1])
                hline[x] = setout(oy, x, hline[x], z)
        return hline

    def process_line(y: int, last: list) -> list:
        m = abs(y - oy)
        hline = norm_line(y).tolist()
        # center column (processLine :856-874)
        z = hline[ox] if m == 1 else calc_height_line(m, last[ox])
        hline[ox] = setout(y, ox, hline[ox], z)
        # left of observer (processLineLeft :723-741)
        for x in range(ox - 1, -1, -1):
            nx = ox - x
            if nx == m:
                z = hline[x] if nx == 1 else calc_height_line(nx, last[x + 1])
            else:
                z = _zcalc(cell_mode, nx, m, hline[x + 1], last[x],
                           last[x + 1])
            hline[x] = setout(y, x, hline[x], z)
        # right of observer (processLineRight :789-807)
        for x in range(ox + 1, w_cols):
            nx = x - ox
            if nx == m:
                z = hline[x] if nx == 1 else calc_height_line(nx, last[x - 1])
            else:
                z = _zcalc(cell_mode, nx, m, hline[x - 1], last[x],
                           last[x - 1])
            hline[x] = setout(y, x, hline[x], z)
        return hline

    def process_line_edge(y: int, last: list) -> list:
        """Edge-mode fast path, identical arithmetic to process_line:
        the near-vertical sector (nx < m) and the diagonal cell read
        ONLY the previous line, so they vectorize; only the outer
        wedge (nx > m) keeps the sequential toward-the-observer
        scan.  ~4x on wide windows; the generic path remains the
        reference twin (test_property_kernels asserts equality)."""
        m = abs(y - oy)
        lastA = np.asarray(last)
        h = norm_line(y)
        vis = np.empty(w_cols, dtype=np.float64) if normal else out[y].copy()
        # center column
        z = h[ox] if m == 1 else calc_height_line(m, lastA[ox])
        if normal:
            vis[ox] = invisible if h[ox] + th < z else visible
        else:
            vis[ox] = max(0.0, vis[ox] + (z - h[ox]))
        if z > h[ox]:
            h[ox] = z
        for sgn in (-1, 1):                   # left, then right
            # inner sector nx in [1, m-1]
            xs = (np.arange(max(0, ox - m + 1), ox) if sgn < 0
                  else np.arange(ox + 1, min(w_cols, ox + m)))
            if xs.size:
                nx = np.abs(xs - ox)
                prev = xs + (1 if sgn < 0 else -1)   # toward observer
                zv = (lastA[prev] * nx + lastA[xs] * (m - nx)) / (m - 1)
                if normal:
                    vis[xs] = np.where(h[xs] + th < zv, invisible, visible)
                else:
                    vis[xs] = np.maximum(0.0, vis[xs] + (zv - h[xs]))
                h[xs] = np.maximum(h[xs], zv)
            # diagonal cell nx == m
            xd = ox - m if sgn < 0 else ox + m
            if 0 <= xd < w_cols and m >= 1 and xd != ox:
                zd = (h[xd] if m == 1
                      else calc_height_line(m, lastA[xd - sgn]))
                if normal:
                    vis[xd] = invisible if h[xd] + th < zd else visible
                else:
                    vis[xd] = max(0.0, vis[xd] + (zd - h[xd]))
                if zd > h[xd]:
                    h[xd] = zd
            # outer wedge nx > m: sequential toward-observer scan
            hl = h.tolist()
            ll = last if isinstance(last, list) else lastA.tolist()
            rng = (range(min(ox - m - 1, ox - 1), -1, -1) if sgn < 0
                   else range(max(ox + m + 1, ox + 1), w_cols))
            for x in rng:
                nx = abs(x - ox)
                zw = calc_height_edge(m, nx, ll[x - sgn], hl[x - sgn])
                if normal:
                    vis[x] = invisible if hl[x] + th < zw else visible
                else:
                    vis[x] = max(0.0, vis[x] + (zw - hl[x]))
                if zw > hl[x]:
                    hl[x] = zw
            h = np.asarray(hl)
        out[y, :] = vis
        return h.tolist()

    line_fn = (process_line_edge
               if cell_mode == "edge" and not _force_generic
               else process_line)
    base = first_line()
    last = base
    for y in range(oy - 1, -1, -1):          # upward sweep
        last = line_fn(y, last)
    last = base
    for y in range(oy + 1, h_rows):          # downward sweep
        last = line_fn(y, last)
    if max_distance > 0:
        r2 = (_dx2[None, :] +
              (cell_sy * (np.arange(h_rows, dtype=np.float64)
                          - oy)[:, None]) ** 2)
        out[r2 > max_distance * max_distance] = out_of_range
    return out.astype(np.uint8) if normal else out


def line_of_sight(dem: np.ndarray, xa: int, ya: int, za: float,
                  xb: int, yb: int, zb: float) -> tuple[bool, int, int]:
    """GDALIsLineOfSightVisible twin.  Returns (visible, ix, iy) with
    (ix, iy) = first terrain intersection or (-1, -1)."""
    def above(x, y, z):
        return z > float(dem[y, x])

    if not above(xa, ya, za):
        return False, xa, ya
    if not above(xb, yb, zb):
        return False, xb, yb
    if xa == xb and ya == yb:
        return True, -1, -1

    def lerp(a, b, t):
        return a + t * (b - a)

    if xa == xb:                              # vertical scan (los.cpp:249)
        step = 1 if yb > ya else -1
        for y in range(ya, yb + step, step):
            zt = lerp(za, zb, (y - ya) / (yb - ya))
            if not above(xa, y, zt):
                return False, xa, y
        return True, -1, -1
    if ya == yb:                              # horizontal scan (:283)
        step = 1 if xb > xa else -1
        for x in range(xa, xb + step, step):
            zt = lerp(za, zb, (x - xa) / (xb - xa))
            if not above(x, ya, zt):
                return False, x, ya
        return True, -1, -1

    # Bresenham2D (:37-108) with lerp(zA, zB, sqrt(r2/R2)) test height
    r_denom = float((xb - xa) ** 2 + (yb - ya) ** 2)

    def z_at(x, y):
        r_num = float((x - xa) ** 2 + (y - ya) ** 2)
        return lerp(za, zb, math.sqrt(r_num / r_denom))

    # Quirk transcribed faithfully: Bresenham2D accumulates with a
    # non-short-circuiting `&=` and ALWAYS runs one final
    # OnBresenhamPoint after the loop (los.cpp:76-87,106), so when the
    # first blocking cell is found mid-walk the loop body still
    # advances and the post-loop test runs on the NEXT cell — if that
    # cell is also below the sight line, ITS coordinates overwrite
    # the reported intersection.
    dx, incx = (xb - xa, 1) if xb >= xa else (xa - xb, -1)
    dy, incy = (yb - ya, 1) if yb >= ya else (ya - yb, -1)
    x, y = xa, ya
    fail = None
    if dx >= dy:
        dy2 = dy * 2
        balance = dy2 - dx
        dx2 = dx * 2
        while x != xb:
            blocked = not above(x, y, z_at(x, y))
            if blocked:
                fail = (x, y)
            if balance >= 0:
                y += incy
                balance -= dx2
            balance += dy2
            x += incx
            if blocked:
                break
    else:
        dx2 = dx * 2
        balance = dx2 - dy
        dy2 = dy * 2
        while y != yb:
            blocked = not above(x, y, z_at(x, y))
            if blocked:
                fail = (x, y)
            if balance >= 0:
                x += incx
                balance -= dy2
            balance += dx2
            y += incy
            if blocked:
                break
    if not above(x, y, z_at(x, y)):       # unconditional final test
        fail = (x, y)
    if fail is not None:
        return False, fail[0], fail[1]
    return True, -1, -1

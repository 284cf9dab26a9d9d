"""Driver-side Delaunay triangulation (Bowyer-Watson).

Fills the qhull role behind GDALTriangulationCreateDelaunay
(/root/reference/alg/delaunay.c:107): the reference triangulates the
whole in-memory point array serially before gridding; this kernel
has the same bounded, driver-side place in the plan (see
operators/grid_interp.py::grid_linear for the distributed split).

Original incremental Bowyer-Watson over numpy doubles:

* points are inserted in INDEX order — fully deterministic;
* the super-triangle is sized from the data bbox so every point is
  strictly interior;
* the incircle predicate is the standard 3x3 determinant evaluated
  against the triangle's orientation sign, in float64.  For point
  sets in general position (no 4 cocircular points — asserted by
  the brute-force cross-check in tests) the result is the unique
  Delaunay triangulation: exactly the set of triangles whose
  circumcircle is empty, which is what the independent SQL oracle
  re-derives by enumeration.

Facets are returned as ascending vertex-index triples, sorted
lexicographically — a canonical form both engines can agree on.
"""

from __future__ import annotations

import numpy as np


def _circumcircle_contains(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """True iff (px, py) lies strictly inside the circumcircle of
    (a, b, c), regardless of the triangle's orientation."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    det = ((adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
           - (bdx * bdx + bdy * bdy) * (adx * cdy - cdx * ady)
           + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady))
    orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return det * orient > 0.0


def delaunay_triangles(xs, ys) -> list[tuple[int, int, int]]:
    """Bowyer-Watson: returns the Delaunay facets as sorted
    ascending (i, j, k) vertex-index triples in lexicographic
    order."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    if n < 3:
        return []
    minx, maxx = float(xs.min()), float(xs.max())
    miny, maxy = float(ys.min()), float(ys.max())
    span = max(maxx - minx, maxy - miny, 1.0)
    midx, midy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    # super-triangle far outside the data (indices n, n+1, n+2)
    px = np.concatenate([xs, [midx - 30.0 * span, midx,
                              midx + 30.0 * span]])
    py = np.concatenate([ys, [midy - 20.0 * span, midy + 30.0 * span,
                              midy - 20.0 * span]])

    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    for p in range(n):
        bad = []
        for t_idx, (a, b, c) in enumerate(tris):
            if _circumcircle_contains(px[a], py[a], px[b], py[b],
                                      px[c], py[c], px[p], py[p]):
                bad.append(t_idx)
        # boundary = edges of the bad-triangle cavity that appear once
        edge_count: dict[tuple[int, int], int] = {}
        for t_idx in bad:
            a, b, c = tris[t_idx]
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        for t_idx in reversed(bad):
            del tris[t_idx]
        for (u, v), cnt in sorted(edge_count.items()):
            if cnt == 1:
                tris.append(tuple(sorted((u, v, p))))

    out = sorted(t for t in tris if max(t) < n)
    return [tuple(int(v) for v in t) for t in out]


def brute_force_delaunay(xs, ys) -> list[tuple[int, int, int]]:
    """The enumeration definition — every ascending triple whose
    circumcircle contains no other point (the SQL oracle's exact
    construction, restated in numpy for tests).  O(n^4): test-scale
    only."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                orient = ((xs[j] - xs[i]) * (ys[k] - ys[i])
                          - (ys[j] - ys[i]) * (xs[k] - xs[i]))
                if orient == 0.0:
                    continue
                if not any(
                    _circumcircle_contains(xs[i], ys[i], xs[j], ys[j],
                                           xs[k], ys[k], xs[m], ys[m])
                    for m in range(n) if m not in (i, j, k)
                ):
                    out.append((i, j, k))
    return out

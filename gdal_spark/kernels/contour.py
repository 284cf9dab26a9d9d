"""Marching-squares contour kernels.

Semantics target: gdal_contour (/root/reference/alg/contour.cpp:331,
568; cell walker /root/reference/alg/marching_squares/).  Pixels are
samples at integer grid coordinates (pixel-center space); each 2x2
cell emits 0-2 level-crossing segments with linear interpolation;
the saddle cases disambiguate on the cell's corner average (the
marching-squares standard the reference's square walker follows).

'Above' is value >= level.  Crossing points on a shared cell edge
are computed from the same two corner values with the same IEEE ops
regardless of which cell (or tile) computes them — so endpoints of
adjacent segments are bit-identical, and the distributed stitcher
can join on exact doubles.
"""

from __future__ import annotations

import numpy as np

# case -> list of (edge_from, edge_to); edges: 0=top 1=right 2=bottom 3=left
# corner bits: 1=tl 2=tr 4=br 8=bl
_CASES = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(0, 3)],
    2: [(0, 1)], 13: [(1, 0)],
    4: [(1, 2)], 11: [(2, 1)],
    8: [(2, 3)], 7: [(3, 2)],
    3: [(3, 1)], 12: [(1, 3)],
    6: [(0, 2)], 9: [(2, 0)],
    # saddles resolved at runtime (5, 10)
}


def _interp(level, va, vb):
    return (level - va) / (vb - va)


def cell_segments(level, x, y, a, b, c, d):
    """Segments of one cell at integer corner coords: a=tl (x,y),
    b=tr (x+1,y), c=bl (x,y+1), d=br (x+1,y+1).  Returns list of
    ((x1,y1),(x2,y2)) in grid coords."""
    idx = ((1 if a >= level else 0) | (2 if b >= level else 0)
           | (4 if d >= level else 0) | (8 if c >= level else 0))
    if idx in (0, 15):
        return []

    def pt(edge):
        if edge == 0:    # top: a-b
            return (x + _interp(level, a, b), float(y))
        if edge == 1:    # right: b-d
            return (float(x + 1), y + _interp(level, b, d))
        if edge == 2:    # bottom: c-d
            return (x + _interp(level, c, d), float(y + 1))
        return (float(x), y + _interp(level, a, c))   # left: a-c

    if idx == 5:         # tl+br above: saddle
        center_above = (a + b + c + d) / 4.0 >= level
        pairs = [(3, 0), (1, 2)] if center_above else [(3, 2), (1, 0)]
    elif idx == 10:      # tr+bl above: saddle
        center_above = (a + b + c + d) / 4.0 >= level
        pairs = [(0, 1), (2, 3)] if center_above else [(0, 3), (2, 1)]
    else:
        pairs = _CASES[idx]
    return [(pt(e1), pt(e2)) for e1, e2 in pairs]


def array_segments(arr, level, y0: int = 0, x0: int = 0, rows=None):
    """All cell segments of a (sub)array; (y0, x0) offsets corner
    coords into global space.  rows restricts which cell rows (local)
    are computed — the tile-ownership hook."""
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    segs = []
    row_range = range(h - 1) if rows is None else rows
    for yy in row_range:
        for xx in range(w - 1):
            segs.extend(cell_segments(
                level, xx + x0, yy + y0,
                a[yy, xx], a[yy, xx + 1], a[yy + 1, xx], a[yy + 1, xx + 1]))
    return segs


def stitch_segments(segs):
    """Chain segments into polylines by exact endpoint equality.

    Deterministic: chains start at the lexicographically smallest
    unused open endpoint (closed loops: smallest point in the loop).
    Returns list of [(x, y), ...] polylines.
    """
    from collections import defaultdict

    nxt = defaultdict(list)
    for i, (p, q) in enumerate(segs):
        nxt[p].append((i, q))
    used = [False] * len(segs)
    incoming = defaultdict(int)
    for _p, q in segs:
        incoming[q] += 1
    lines = []
    # open chains first: start points with no incoming segment
    starts = sorted(p for p in nxt if incoming[p] == 0)
    for s in starts:
        for i, q in sorted(nxt[s], key=lambda t: t[1]):
            if used[i]:
                continue
            line = [s, q]
            used[i] = True
            cur = q
            while True:
                cand = [(j, r) for j, r in nxt.get(cur, ()) if not used[j]]
                if not cand:
                    break
                j, r = min(cand, key=lambda t: t[1])
                used[j] = True
                line.append(r)
                cur = r
            lines.append(line)
    # remaining are closed loops
    for i in sorted(range(len(segs)),
                    key=lambda k: (segs[k][0], segs[k][1])):
        if used[i]:
            continue
        p, q = segs[i]
        used[i] = True
        line = [p, q]
        cur = q
        while cur != p:
            cand = [(j, r) for j, r in nxt.get(cur, ()) if not used[j]]
            if not cand:
                break
            j, r = min(cand, key=lambda t: t[1])
            used[j] = True
            line.append(r)
            cur = r
        lines.append(line)
    return lines


def contour_array(arr, level):
    """Single-array reference: segments + stitched polylines."""
    return stitch_segments(array_segments(arr, level))

"""Polygon boolean operations (Intersection / Union / Difference /
SymDifference) as a planar overlay — the geometric kernel behind
polygon x polygon layer algebra and the ST_ set functions.

Role model: OGRGeometry::Intersection / Union / Difference /
SymDifference (/root/reference/ogr/ogrgeometry.cpp:4895,5080,5333,
5406 — GEOS-backed there); semantics validated against the layer-
algebra goldens in /root/reference/autotest/ogr/ogr_layer_algebra.py
(adjacent/overlapping squares incl. shared-edge degeneracies).

Algorithm (overlay with midpoint classification):

  1. orient every ring interior-left (outer CCW, holes CW, by
     even-odd nesting depth);
  2. split every edge of A at its intersections with every edge of B
     and vice versa — each crossing point is computed ONCE and shared
     by both splits, so sub-edge endpoints match bit-exactly;
     collinear overlaps contribute both interval endpoints to both
     edges, so overlapping boundary sub-edges coincide exactly;
  3. classify each sub-edge: ``boundary`` when the other region has
     the identical sub-edge (same or opposite direction — dict
     lookup, no tolerance), else strictly in/out by even-odd ray
     cast of the midpoint (a sub-edge cannot cross the other
     boundary: it was split at every crossing);
  4. keep edges per op (interior-left invariant):
       intersection: A-in  + B-in  + shared-same (one copy)
       union:        A-out + B-out + shared-same (one copy)
       difference:   A-out + reversed B-in + shared-opposite
       symdifference = difference(A,B) + difference(B,A)
  5. chain kept edges into rings (at multi-valence vertices take the
     first outgoing edge clockwise from the reversed incoming one —
     the interior-left face continuation), then nest CW holes under
     their smallest containing CCW outer.

Results are AREAL only: lower-dimension leftovers (shared edges,
touch points) vanish, i.e. KEEP_LOWER_DIMENSION_GEOMETRIES=NO, the
layer-algebra default the reference tests pin down.

A "region" is ``list[np.ndarray (M,2)]`` of closed rings under
even-odd semantics; a "polygon list" is ``list[region]`` nested
outer-first as WKB expects.
"""

from __future__ import annotations

import math

import numpy as np

from .pip import points_in_polygon, points_in_ring

EPS_T = 1e-12

# Vertex snap quantum: every point entering an overlay (input vertices
# and computed crossings) is rounded to multiples of 2^-33.  Exact
# test fixtures (dyadic coordinates with <= 33 fractional bits) pass
# through unchanged; nearly-coincident points from near-tangent
# intersections (buffer discs grazing edges) merge instead of leaving
# hairline gaps that break ring chaining.
SNAP = 2.0 ** 33


def _snap(p):
    return (round(p[0] * SNAP) / SNAP, round(p[1] * SNAP) / SNAP)


def even_odd_inside(px, py, rings):
    """True even-odd membership over an ARBITRARY ring set (disjoint
    parts + holes, any nesting) — xor of per-ring ray casts.
    points_in_polygon assumes [outer, holes...]; a multi-region has
    no single global outer, so the overlay must use this."""
    px = np.asarray(px, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for r in rings:
        inside ^= points_in_ring(px, py, r)
    return inside


# ---------------------------------------------------------------- rings
def ring_signed_area(ring) -> float:
    """Shoelace; >0 = CCW in a y-up world."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    return float(np.sum(x * y1 - x1 * y) / 2.0)


def ring_interior_point(ring):
    """A point STRICTLY inside a simple ring (the classic convex-
    vertex/triangle construction GEOS uses for interior points):
    take the lowest-then-leftmost vertex v (necessarily convex), its
    neighbors a and b; if no other ring vertex intrudes into
    triangle (a, v, b) its centroid is interior, else the midpoint
    of v and the closest intruding vertex is.  Unlike probing a ring
    VERTEX, the result never lies on a snapped shared vertex of
    another ring, so even-odd depth tests stay stable."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
        r = r[:-1]
    n = len(r)
    i = int(np.lexsort((r[:, 0], r[:, 1]))[0])
    v, a, b = r[i], r[(i - 1) % n], r[(i + 1) % n]
    orient = (v[0] - a[0]) * (b[1] - a[1]) - (v[1] - a[1]) * (b[0] - a[0])
    if orient == 0.0:                      # collinear: nudge off v
        return (float(0.5 * v[0] + 0.25 * (a[0] + b[0])),
                float(0.5 * v[1] + 0.25 * (a[1] + b[1])))
    sgn = 1.0 if orient > 0 else -1.0

    def _side(p, q):
        return ((q[0] - p[0]) * (r[:, 1] - p[1])
                - (q[1] - p[1]) * (r[:, 0] - p[0]))

    inside = ((sgn * _side(a, v) > 0) & (sgn * _side(v, b) > 0)
              & (sgn * _side(b, a) > 0))
    cand = r[inside]
    if len(cand) == 0:
        return (float((a[0] + v[0] + b[0]) / 3.0),
                float((a[1] + v[1] + b[1]) / 3.0))
    d2 = ((cand - v) ** 2).sum(axis=1)
    q = cand[int(np.argmin(d2))]
    return (float((v[0] + q[0]) / 2.0), float((v[1] + q[1]) / 2.0))


def orient_region(rings):
    """Normalize a ring set interior-left: rings at even even-odd
    nesting depth CCW, odd depth CW."""
    rs = [np.asarray(r, dtype=np.float64) for r in rings]
    out = []
    for i, r in enumerate(rs):
        others = [o for j, o in enumerate(rs) if j != i]
        depth = 0
        if others:
            # probe a STRICT interior point of r (a ring vertex can
            # sit exactly on another ring after snapping, making the
            # even-odd depth arbitrary)
            px, py = ring_interior_point(r)
            for o in others:
                if points_in_polygon(np.array([px]), np.array([py]), [o])[0]:
                    depth += 1
        ccw = ring_signed_area(r) > 0
        want_ccw = depth % 2 == 0
        out.append(r if ccw == want_ccw else r[::-1])
    return out


def region_edges(rings):
    """Directed (p, q) tuples over all rings (closed: last==first)."""
    edges = []
    for r in rings:
        for i in range(len(r) - 1):
            p = _snap((float(r[i, 0]), float(r[i, 1])))
            q = _snap((float(r[i + 1, 0]), float(r[i + 1, 1])))
            if p != q:
                edges.append((p, q))
    return edges


# ------------------------------------------------------- edge splitting
def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _seg_splits(a, b, c, d):
    """Split params of segment ab and cd against each other.

    Returns (ts_ab, ts_cd): lists of (t, point) with the crossing
    point computed once and shared.  Handles proper crossings,
    endpoint touches and collinear overlaps.
    """
    ax, ay = a
    bx, by = b
    cx, cy = c
    dx, dy = d
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    denom = _cross(rx, ry, sx, sy)
    qpx, qpy = cx - ax, cy - ay
    if denom != 0.0:
        t = _cross(qpx, qpy, sx, sy) / denom
        u = _cross(qpx, qpy, rx, ry) / denom
        if -EPS_T <= t <= 1 + EPS_T and -EPS_T <= u <= 1 + EPS_T:
            # snap exact endpoints so shared vertices stay exact
            if t <= EPS_T:
                pt = a
            elif t >= 1 - EPS_T:
                pt = b
            elif u <= EPS_T:
                pt = c
            elif u >= 1 - EPS_T:
                pt = d
            else:
                pt = (ax + t * rx, ay + t * ry)
            return [(t, pt)], [(u, pt)]
        return [], []
    # parallel: collinear?
    if _cross(qpx, qpy, rx, ry) != 0.0:
        return [], []
    rr = rx * rx + ry * ry
    if rr == 0.0:
        return [], []
    t_c = (qpx * rx + qpy * ry) / rr
    t_d = ((dx - ax) * rx + (dy - ay) * ry) / rr
    ss = sx * sx + sy * sy
    u_a = (-qpx * sx - qpy * sy) / ss
    u_b = ((bx - cx) * sx + (by - cy) * sy) / ss
    ts_ab = [(t, p) for t, p in ((t_c, c), (t_d, d))
             if EPS_T < t < 1 - EPS_T]
    ts_cd = [(u, p) for u, p in ((u_a, a), (u_b, b))
             if EPS_T < u < 1 - EPS_T]
    return ts_ab, ts_cd


def split_edges(edges_a, edges_b):
    """Sub-edges of both edge sets, split at all mutual crossings."""
    splits_a = [[] for _ in edges_a]
    splits_b = [[] for _ in edges_b]
    for i, (p, q) in enumerate(edges_a):
        for j, (c, d) in enumerate(edges_b):
            # cheap bbox reject
            if (min(p[0], q[0]) > max(c[0], d[0])
                    or max(p[0], q[0]) < min(c[0], d[0])
                    or min(p[1], q[1]) > max(c[1], d[1])
                    or max(p[1], q[1]) < min(c[1], d[1])):
                continue
            sa, sb = _seg_splits(p, q, c, d)
            splits_a[i].extend(sa)
            splits_b[j].extend(sb)

    def cut(edges, splits):
        out = []
        for (p, q), ts in zip(edges, splits):
            pts = [p]
            for t, pt in sorted(
                    (tp for tp in ts if EPS_T < tp[0] < 1 - EPS_T)):
                pt = _snap(pt)
                if pt != pts[-1] and pt != q:
                    pts.append(pt)
            pts.append(q)
            for k in range(len(pts) - 1):
                if pts[k] != pts[k + 1]:
                    out.append((pts[k], pts[k + 1]))
        return out

    return cut(edges_a, splits_a), cut(edges_b, splits_b)


# ------------------------------------------------------- classification
def classify_subedges(subs, other_subs, other_rings):
    """Tag each sub-edge 'in' | 'out' | 'bnd_same' | 'bnd_opp'."""
    same = set(other_subs)
    opp = {(q, p) for p, q in other_subs}
    tags = []
    mids_x, mids_y, idxs = [], [], []
    for i, (p, q) in enumerate(subs):
        if (p, q) in same:
            tags.append("bnd_same")
        elif (p, q) in opp:
            tags.append("bnd_opp")
        else:
            tags.append(None)
            mids_x.append((p[0] + q[0]) / 2.0)
            mids_y.append((p[1] + q[1]) / 2.0)
            idxs.append(i)
    if idxs:
        inside = even_odd_inside(
            np.asarray(mids_x), np.asarray(mids_y), other_rings)
        for k, i in enumerate(idxs):
            tags[i] = "in" if inside[k] else "out"
    return tags


# --------------------------------------------------------- ring assembly
def _chain_rings(edges):
    """Chain directed edges into closed rings; at a multi-valence
    vertex take the first outgoing edge clockwise from the reversed
    incoming edge (interior-left face traversal)."""
    out_map: dict[tuple, list] = {}
    for e in edges:
        out_map.setdefault(e[0], []).append(e)
    rings = []
    used = set()
    for start_edge in edges:
        if id(start_edge) in used:
            continue
        # walk
        ring = [start_edge[0], start_edge[1]]
        used.add(id(start_edge))
        prev = start_edge
        guard = 0
        # a simple ring can use each directed edge at most once, so a
        # walk longer than the edge count means an inconsistent edge
        # set — raise instead of silently truncating a large ring
        max_steps = len(edges) + 1
        while ring[-1] != ring[0] and guard <= max_steps:
            if guard == max_steps:
                raise ValueError(
                    "ring walk exceeded the edge count: "
                    "inconsistent overlay edge set")
            guard += 1
            v = prev[1]
            cands = [e for e in out_map.get(v, ()) if id(e) not in used]
            if not cands:
                break  # open chain: drop (degenerate leftovers)
            if len(cands) == 1:
                nxt = cands[0]
            else:
                ux, uy = prev[0][0] - v[0], prev[0][1] - v[1]
                back = math.atan2(uy, ux)

                def cw_angle(e):
                    wx, wy = e[1][0] - v[0], e[1][1] - v[1]
                    ang = back - math.atan2(wy, wx)
                    ang %= 2 * math.pi
                    return ang if ang > 1e-12 else 2 * math.pi

                nxt = min(cands, key=cw_angle)
            used.add(id(nxt))
            ring.append(nxt[1])
            prev = nxt
        if ring[-1] == ring[0] and len(ring) >= 4:
            rings.append(np.array(ring, dtype=np.float64))
    return rings


def _nest_polygons(rings):
    """CCW rings -> outers, CW -> holes under smallest containing
    outer.  Returns list of [outer, hole...] regions."""
    outers, holes = [], []
    for r in rings:
        (outers if ring_signed_area(r) > 0 else holes).append(r)
    polys = [[o] for o in outers]
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        best, best_area = None, None
        for i, o in enumerate(outers):
            if points_in_polygon(np.array([px]), np.array([py]), [o])[0]:
                a = abs(ring_signed_area(o))
                if best is None or a < best_area:
                    best, best_area = i, a
        if best is not None:
            polys[best].append(h)
    return polys


# ------------------------------------------------------------- operator
def boolean_op(rings_a, rings_b, op: str):
    """Overlay boolean of two even-odd regions.

    op: 'intersection' | 'union' | 'difference' | 'symdifference'.
    Returns list of polygons ([outer, hole...]); [] when empty.
    """
    if op == "symdifference":
        return (boolean_op(rings_a, rings_b, "difference")
                + boolean_op(rings_b, rings_a, "difference"))

    A = orient_region(rings_a)
    B = orient_region(rings_b)
    ea, eb = region_edges(A), region_edges(B)
    if not ea or not eb:
        if op == "intersection":
            return []
        if op == "difference":
            return _nest_polygons(_chain_rings(ea)) if ea else []
        # union
        return _nest_polygons(_chain_rings(ea + eb))
    sa, sb = split_edges(ea, eb)
    ta = classify_subedges(sa, sb, B)
    tb = classify_subedges(sb, sa, A)

    keep = []
    if op == "intersection":
        keep += [e for e, t in zip(sa, ta) if t in ("in", "bnd_same")]
        keep += [e for e, t in zip(sb, tb) if t == "in"]
    elif op == "union":
        keep += [e for e, t in zip(sa, ta) if t in ("out", "bnd_same")]
        keep += [e for e, t in zip(sb, tb) if t == "out"]
    elif op == "difference":
        keep += [e for e, t in zip(sa, ta) if t in ("out", "bnd_opp")]
        keep += [(q, p) for (p, q), t in zip(sb, tb) if t == "in"]
    else:
        raise ValueError(f"unknown op {op!r}")
    return _nest_polygons(_chain_rings(keep))


def polygons_area(polys) -> float:
    """Total area of a boolean_op result (holes subtract)."""
    return sum(
        sum(ring_signed_area(r) for r in region) for region in polys)


def flatten(polys):
    """boolean_op result -> flat even-odd ring set (region), ready to
    feed back into boolean_op (a multipolygon IS one region)."""
    return [r for region in polys for r in region]


def rings_of_wkb(data: bytes):
    """Polygon/MultiPolygon WKB -> even-odd ring set."""
    from . import wkb as kwkb

    return kwkb.polygon_rings(data)


def wkb_of_polys(polys) -> bytes:
    """boolean_op result -> WKB (Polygon or MultiPolygon)."""
    from . import wkb as kwkb

    if len(polys) == 1:
        return kwkb.wkb_polygon(polys[0])
    return kwkb.wkb_multipolygon(polys)


def make_valid(rings):
    """Split self-intersecting rings into simple lobes
    (OGRGeometry::MakeValid role, ogrgeometry.cpp:5580, even-odd
    interpretation): self-split all edges, trace every face of the
    arrangement (both edge directions), keep CCW faces whose interior
    has odd even-odd parity against the input.  Hole-free subset: a
    ring set with no self-intersections is returned normalized
    (holes preserved); self-intersecting inputs come back as their
    simple lobes (holes inside lobes are not reconstructed)."""
    rs = [np.asarray(r, dtype=np.float64) for r in rings]
    edges = region_edges(rs)
    sa, _ = split_edges(edges, edges)
    if len(sa) == len(edges):
        return _nest_polygons(
            _chain_rings(region_edges(orient_region(rs))))
    both = sa + [(q, p) for p, q in sa]
    keep = []
    for f in _chain_rings(both):
        if ring_signed_area(f) <= 0:
            continue
        # strict interior point of the face (the vertex MEAN can
        # fall outside a concave lobe)
        cx, cy = ring_interior_point(f)
        if even_odd_inside(np.array([cx]), np.array([cy]), rs)[0]:
            keep.append(f)
    return _nest_polygons(keep)


def buffer_region(rings, dist: float, n_seg: int = 32,
                  closed: bool = True):
    """Positive buffer via piecewise Minkowski sum: the region (when
    closed) unioned with one rectangle per boundary edge and one
    n_seg-gon disc per vertex — OGRGeometry::Buffer role
    (ogrgeometry.cpp:4772, GEOS there; round joins approximated by
    the disc polygons).  ``closed=False`` buffers a polyline into a
    capsule.  Negative distances are not supported."""
    if dist <= 0:
        raise ValueError("buffer_region: positive distances only")
    ang = np.linspace(0.0, 2 * math.pi, n_seg + 1)
    cosang = np.cos(ang)
    sinang = np.sin(ang)
    pieces = []
    if closed:
        pieces.append([np.asarray(r, dtype=np.float64) for r in rings])
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        m = len(r) - 1 if closed else len(r)
        for i in range(m if closed else len(r) - 1):
            p, q = r[i], r[i + 1]
            dx, dy = q[0] - p[0], q[1] - p[1]
            ln = math.hypot(dx, dy)
            if ln == 0.0:
                continue
            nx, ny = -dy / ln * dist, dx / ln * dist
            quad = np.array([
                (p[0] + nx, p[1] + ny), (q[0] + nx, q[1] + ny),
                (q[0] - nx, q[1] - ny), (p[0] - nx, p[1] - ny),
                (p[0] + nx, p[1] + ny)])
            pieces.append([quad])
        for i in range(m):
            v = r[i]
            disc = np.column_stack(
                [v[0] + dist * cosang, v[1] + dist * sinang])
            disc[-1] = disc[0]
            pieces.append([disc])
    return union_all(pieces)


def union_all(ring_sets):
    """Cascaded union of many regions (UnionCascaded role,
    ogrgeometry.cpp:5131): sequential fold — callers distribute the
    fold tree (partition partials, then a final merge)."""
    acc = None
    for rings in ring_sets:
        if acc is None:
            acc = [np.asarray(r, dtype=np.float64) for r in rings]
            continue
        acc = flatten(boolean_op(acc, rings, "union"))
    return _nest_polygons(_chain_rings(region_edges(orient_region(acc)))) \
        if acc is not None else []


# ------------------------------------------------- line x region clip
def clip_line_by_region(coords, rings, keep_inside: bool = True):
    """Linestring x polygon intersection (keep_inside) / difference:
    every polyline segment is split at region-edge crossings, the
    sub-segments classified by their midpoint's even-odd containment,
    and consecutive kept sub-segments chained back into linestrings —
    the line-areal role of OGRGeometry::Intersection/Difference
    (ogrgeometry.cpp:4895/:5333, GEOS overlay).  Pieces collinear
    with the boundary follow the even-odd midpoint test.

    coords: (N, 2) array-like; rings: region rings (outer + holes).
    Returns a list of coordinate lists (each a linestring piece).
    """
    edges = region_edges(rings)
    pieces = []
    cur = None

    def flush():
        nonlocal cur
        if cur is not None and len(cur) >= 2:
            pieces.append(cur)
        cur = None

    n = len(coords)
    for i in range(n - 1):
        a = (float(coords[i][0]), float(coords[i][1]))
        b = (float(coords[i + 1][0]), float(coords[i + 1][1]))
        if a == b:
            continue
        ts = []
        for (c, d) in edges:
            if (min(a[0], b[0]) > max(c[0], d[0])
                    or max(a[0], b[0]) < min(c[0], d[0])
                    or min(a[1], b[1]) > max(c[1], d[1])
                    or max(a[1], b[1]) < min(c[1], d[1])):
                continue
            sa, _sb = _seg_splits(a, b, c, d)
            ts.extend(t for t, _p in sa if EPS_T < t < 1 - EPS_T)
        cuts = [0.0] + sorted(set(ts)) + [1.0]
        spans = [(t0, t1) for t0, t1 in zip(cuts[:-1], cuts[1:])
                 if t1 - t0 > EPS_T]
        if not spans:
            continue
        tm = np.array([0.5 * (t0 + t1) for t0, t1 in spans])
        ins = even_odd_inside(a[0] + tm * (b[0] - a[0]),
                              a[1] + tm * (b[1] - a[1]), rings)
        for (t0, t1), inside in zip(spans, ins):
            if bool(inside) != keep_inside:
                flush()
                continue
            p0 = a if t0 == 0.0 else (a[0] + t0 * (b[0] - a[0]),
                                      a[1] + t0 * (b[1] - a[1]))
            p1 = b if t1 == 1.0 else (a[0] + t1 * (b[0] - a[0]),
                                      a[1] + t1 * (b[1] - a[1]))
            if cur is not None and cur[-1] == p0:
                cur.append(p1)
            else:
                flush()
                cur = [p0, p1]
    flush()
    return pieces

"""Serial golden twins for the non-SQL-expressible raster queries.

Rasterize scanline fill, overview decimation, sieve merge, polygonize
ring tracing and marching-squares stitching cannot be written as
DuckDB SQL — but their catalog queries CAN still get a real value
comparison: each function here recomputes the query's expected output
with the SERIAL numpy kernels (independently golden-tested against
the cited GDAL algorithms in tests/) composed single-machine-style —
full-canvas arrays + dict union-find instead of tiles + shuffles —
and renders it as a DuckDB ``VALUES`` table.  What the driver then
verifies is exactly the part SQL can't see: the distributed assembly
(tile fan-out joins, border equivalence shuffles, min-label
propagation, per-component regrouping) against the one-pass result.

The SQL strings are built lazily (``Q.resolve_sql``) so importing the
catalog stays cheap; each golden computes in well under a second at
fixture scale and is cached per process.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..kernels import checksum as kck
from ..kernels import contour as kc
from ..kernels import polygonize as kpoly
from ..kernels import rasterize as kr
from ..kernels import sieve as ksv
from ..kernels import wkb as kwkb
from ..kernels.cells import TileGrid
from ..sources import fixtures as fx

R_TS = 64
R_ZOOM = 3
GW = 64

_TY_SHIFT = 20
_TX_SHIFT = 40


def _values_sql(rows, cols: list[tuple[str, str]]) -> str:
    """VALUES table with per-column casts (the driver hash is
    type-sensitive, so INTEGER literals must be cast up to match the
    Spark schema exactly)."""
    def lit(v):
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            # quoted-string cast: a bare literal is typed DECIMAL by
            # DuckDB and loses the exact binary double (one-ulp drift)
            return f"'{v!r}'::DOUBLE"
        return str(int(v))

    body = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    names = ", ".join(n for n, _ in cols)
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    order = ", ".join(n for n, _ in cols)
    return (f"SELECT {sel} FROM (VALUES {body}) AS t({names}) "
            f"ORDER BY {order}")


@lru_cache(maxsize=1)
def _serial_tiles() -> dict[tuple[int, int], np.ndarray]:
    """One-pass twin of rasterize_tiles on the polygon fixture:
    per covered tile, burn intersecting geometries in fid order with
    the same scanline kernel and geotransform."""
    grid = TileGrid.local(*fx.POLY_BBOX, tile_size=R_TS)
    polys = fx.polygons_pandas()
    tiles: dict[tuple[int, int], np.ndarray] = {}
    per_tile: dict[tuple[int, int], list] = {}
    for _, row in polys.iterrows():
        tx0, ty0, tx1, ty1 = grid.tile_range_for_bbox(
            R_ZOOM, row["xmin"], row["ymin"], row["xmax"], row["ymax"])
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                per_tile.setdefault((tx, ty), []).append(row)
    for (tx, ty), rows in per_tile.items():
        gt = grid.geotransform(R_ZOOM, tx, ty)
        img = np.zeros((R_TS, R_TS), dtype=np.uint8)
        for row in sorted(rows, key=lambda r: r["fid"]):
            gtype, payload = kwkb.parse_wkb(bytes(row["wkb"]))
            px = [kr.world_to_pixel(r, gt) for r in payload]
            kr.rasterize_geometry(img, gtype, px, float(row["eas_id"]),
                                  kr.MERGE_REPLACE, False)
        tiles[(tx, ty)] = img
    return tiles


def rasterize_tiles_sql() -> str:
    rows = [
        (R_ZOOM, tx, ty, kck.checksum(img))
        for (tx, ty), img in sorted(_serial_tiles().items())
    ]
    return _values_sql(
        rows, [("z", "INT"), ("tx", "BIGINT"), ("ty", "BIGINT"),
               ("checksum", "BIGINT")])


def tile_pyramid_sql() -> str:
    level = _serial_tiles()
    out = [
        (R_ZOOM, tx, ty, kck.checksum(img))
        for (tx, ty), img in level.items()
    ]
    for z in range(R_ZOOM, 0, -1):
        parents: dict[tuple[int, int], np.ndarray] = {}
        for (tx, ty), img in level.items():
            key = (tx >> 1, ty >> 1)
            canvas = parents.setdefault(
                key, np.zeros((2 * R_TS, 2 * R_TS), dtype=np.uint8))
            qx, qy = tx - 2 * key[0], ty - 2 * key[1]
            canvas[qy * R_TS:(qy + 1) * R_TS, qx * R_TS:(qx + 1) * R_TS] = img
        level = {}
        for key, canvas in parents.items():
            c = canvas.astype(np.int64)
            tot = (c[::2, ::2] + c[::2, 1::2] + c[1::2, ::2] + c[1::2, 1::2])
            level[key] = ((tot + 2) // 4).astype(np.uint8)
        out.extend(
            (z - 1, tx, ty, kck.checksum(img))
            for (tx, ty), img in level.items())
    return _values_sql(
        sorted(out), [("z", "INT"), ("tx", "BIGINT"), ("ty", "BIGINT"),
                      ("checksum", "BIGINT")])


def polygonize_sql() -> str:
    """Serial steps 1-4: per-tile labels with the SAME packed node
    ids, dict union-find (min-root) over cross-tile equal-value
    4-adjacency, then per-component ring tracing."""
    tiles = _serial_tiles()
    n = (1 << R_ZOOM) * R_TS
    node = np.full((n, n), -1, dtype=np.int64)
    value = np.zeros((n, n), dtype=np.int64)
    for (tx, ty), img in tiles.items():
        labels, _ = kpoly.label_components(img, connect8=False, nodata=0)
        base = (tx << _TX_SHIFT) | (ty << _TY_SHIFT)
        ys, xs = np.nonzero(labels > 0)
        node[ty * R_TS + ys, tx * R_TS + xs] = base + labels[ys, xs]
        value[ty * R_TS + ys, tx * R_TS + xs] = img[ys, xs]

    parent: dict[int, int] = {}

    def find(i):
        r = i
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[i] != r:
            parent[i], i = r, parent[i]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    valid = node >= 0
    h = valid[:, :-1] & valid[:, 1:] & (value[:, :-1] == value[:, 1:])
    for y, x in zip(*np.nonzero(h)):
        union(int(node[y, x]), int(node[y, x + 1]))
    v = valid[:-1, :] & valid[1:, :] & (value[:-1, :] == value[1:, :])
    for y, x in zip(*np.nonzero(v)):
        union(int(node[y, x]), int(node[y + 1, x]))

    comps: dict[int, dict] = {}
    ys, xs = np.nonzero(valid)
    for y, x in zip(ys.tolist(), xs.tolist()):
        c = find(int(node[y, x]))
        d = comps.setdefault(c, {"value": int(value[y, x]), "n": 0,
                                 "ys": [], "xs": []})
        d["n"] += 1
        d["ys"].append(y)
        d["xs"].append(x)
    rows = []
    for c, d in comps.items():
        y0, y1 = min(d["ys"]), max(d["ys"])
        x0, x1 = min(d["xs"]), max(d["xs"])
        mask = np.zeros((y1 - y0 + 1, x1 - x0 + 2), dtype=bool)
        mask[np.array(d["ys"]) - y0, np.array(d["xs"]) - x0] = True
        rings = kpoly.trace_rings(mask, connect8=False)
        rows.append((c, d["value"], d["n"], len(rings)))
    return _values_sql(
        sorted(rows), [("comp", "BIGINT"), ("value", "BIGINT"),
                       ("pixel_count", "BIGINT"), ("n_rings", "INT")])


def _sieve_fixture() -> np.ndarray:
    rr, cc = np.mgrid[0:GW, 0:GW]
    a = ((rr // 8 + cc // 8) % 4).astype(np.uint8)
    a[(rr * GW + cc) % 97 == 0] = 9
    return a


def sieve_sql() -> str:
    out = ksv.sieve_array(_sieve_fixture(), threshold=4, connect8=False,
                          nodata=None)
    vals, counts = np.unique(out, return_counts=True)
    rows = [(int(v), int(c)) for v, c in zip(vals, counts)]
    return _values_sql(rows, [("value", "BIGINT"), ("n_px", "BIGINT")])


def _derived_grid() -> np.ndarray:
    idx = np.arange(GW * GW).reshape(GW, GW)
    return ((idx * 7) % 256).astype(np.float64)


def contour_sql() -> str:
    arr = _derived_grid()
    rows = []
    for level in (100.5, 200.5):
        for pts in kc.contour_array(arr, level):
            rows.append((float(level), len(pts),
                         len(pts) > 1 and pts[0] == pts[-1]))
    return _values_sql(
        sorted(rows), [("level", "DOUBLE"), ("n_pts", "INT"),
                       ("closed", "BOOLEAN")])


# ================== polygon x polygon layer algebra twins ==================
# Same kernel, same fold orders, serial composition — what the driver
# verifies is the distributed pairing (cell join), the cogroup
# remainder folds, and the tree-union, against a one-pass run.

POLY_SHIFT = (140.0, 110.0)


POLY_ORIGIN = (478000.0, 4763000.0)


def _shift_layer(pdf, dx: float, dy: float):
    out = pdf.copy()
    new_wkb, bb = [], []
    for w in out["wkb"]:
        rings = [r + np.array([dx, dy]) for r in kwkb.polygon_rings(bytes(w))]
        nw = kwkb.wkb_polygon(rings)
        new_wkb.append(nw)
        bb.append(kwkb.wkb_bbox(nw))
    out["wkb"] = new_wkb
    out["xmin"] = [x[0] for x in bb]
    out["ymin"] = [x[1] for x in bb]
    out["xmax"] = [x[2] for x in bb]
    out["ymax"] = [x[3] for x in bb]
    return out


@lru_cache(maxsize=1)
def _poly_layers():
    """A = fixture polygons shifted by POLY_SHIFT (partial overlaps
    with their own originals), B = fixture polygons.  Both layers are
    translated into a local metre frame (origin POLY_ORIGIN) so that
    shoelace/trapezoid products stay ~1e7 and double error ~1e-9 —
    required for the 3-decimal compare against the independent slab
    oracle (_slab_oracle.py), and the right habit for any overlay at
    UTM magnitudes."""
    ox, oy = POLY_ORIGIN
    b = _shift_layer(fx.polygons_pandas(), -ox, -oy)
    dx, dy = POLY_SHIFT
    a = _shift_layer(b, dx, dy)
    return a, b



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

FORMULA-DIFF register (round 3).  Most of the round-2 VALUES oracles
were replaced by independent re-derivations — la_poly_* x7 +
cascaded_union by the SQL slab sweep (_slab_oracle.py), polygonize by
runs -> recursive-CTE components -> Euler ring counts, tile_pyramid
by the SQL decimation recurrence, and the new rasterize_points /
rasterize_lines by SQL pixel arithmetic / a recursive-CTE Bresenham
walker (queries/raster.py).  For each VALUES oracle that REMAINS
(the truly serial algorithms), this records the formula-level diff
against the cited reference lines — the discipline that caught the
round-2 Manhattan/LOS divergences:

* rasterize_tiles (polygon scanline): fill_polygon transcribes
  llrasterize.cpp:55-230 — half-pixel sample centers, the span
  rounding, and burn-span bounds; pinned by
  tests/test_kernels.py::test_rasterize_polygon_center_rule_golden,
  test_rasterize_merge_add_and_clamp_range,
  test_horizontal_bottom_segment_filled_separately.  The POINT and
  LINE burn kernels are now SQL-verified end-to-end
  (rasterize_points / rasterize_lines), which also pins the shared
  merge plumbing.
* sieve — DOCUMENTED DIVERGENCE (kernels/sieve.py docstring): GDAL's
  GDALSieveFilter merges sequentially in polygon-list order; the
  kernel runs simultaneous rounds where each small component adopts
  its largest current neighbor (ties -> smallest id) to a fixpoint.
  Semantics-equivalent for the operator's contract (small blobs
  vanish into dominant neighbors); pinned by
  tests/test_sieve.py::test_sieve_merge_cascade_semantics,
  test_sieve_tile_split_invariance,
  test_sieve_threshold_one_is_identity.
* contour (marching squares, alg/marching_squares/): 'above' is
  v >= level, crossing interpolant (level - va) / (vb - va) in that
  operand order (bit-identical on shared edges, the stitching
  invariant), saddles disambiguated on the corner average; pinned by
  tests/test_contour.py incl. the round-3 saddle case.  The CELL
  GEOMETRY (16-case table + interpolation + saddle rule + tile-halo
  assembly) is now ALSO SQL-verified end-to-end by the
  contour_segments query (queries/raster.py), so only the polyline
  stitching itself still rests on this golden.
* viewshed / viewshed_curved (viewshed_executor.cpp): CalcHeight*
  recurrences :52-75 verbatim; setOutput :179-192 including the
  non-Normal "+= then clamp at 0" order; adjustHeight :244-328 with
  heightAdjFactor = curve_coeff/(2a) and the r^2 geotransform terms;
  max-distance post-mask proven equivalent (kernels/viewshed.py
  docstring).  Curvature horizon + mode identities are pinned by
  closed-form tests (test_viewshed.py round-3 block).
* mediancut_dither (gdalmediancut.cpp/gdaldither.cpp): 5-bit
  histogram cube with driver-side median cuts, Manhattan
  FindNearestColor (gdaldither.cpp:665-684, the round-2 review
  catch), truncated-toward-zero error sixths :516-527 and the
  next-line error pre-pass clamp :384-392; pinned by
  tests/test_quantize.py hand cases; the halo pass (round 3)
  quantifies the only intentional divergence (tile seams).
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



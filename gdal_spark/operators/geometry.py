"""Geometry-shape transforms at the feature level.

``explode_collections`` — ogr2ogr -explodecollections
(/root/reference/apps/ogr2ogr_lib.cpp:6569-6610): every part of a
Multi*/GeometryCollection becomes its own output feature (attributes
duplicated); non-collection geometries pass through unchanged
(nIters = 1), and an EMPTY collection still emits one row with a
NULL part (nIters = max(1, nParts)).

Spark shape: one Arrow pass (mapInPandas) parsing WKB with the repo's
struct/numpy kernel, re-encoding each part as standalone WKB.  The
explode happens inside the batch (pandas repeat), so output rows never
round-trip through the driver; at 10^12 features this is a map-only
stage that preserves the input partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import wkb as kw

_SINGLE_OF = {kw.MULTIPOINT: kw.POINT,
              kw.MULTILINESTRING: kw.LINESTRING,
              kw.MULTIPOLYGON: kw.POLYGON,
              kw.POLYHEDRALSURFACE: kw.POLYGON,
              kw.TIN: kw.TRIANGLE}

_PART_WRITER = {kw.LINESTRING: kw.wkb_linestring,
                kw.CIRCULARSTRING: kw.wkb_circularstring,
                kw.POLYGON: kw.wkb_polygon,
                kw.TRIANGLE: kw.wkb_triangle,
                kw.MULTIPOINT: kw.wkb_multipoint,
                kw.MULTILINESTRING: kw.wkb_multilinestring,
                kw.MULTIPOLYGON: kw.wkb_multipolygon,
                kw.MULTICURVE: kw.wkb_multicurve}


def _encode_part(gtype: int, payload, z: bool = False,
                 m: bool = False) -> bytes:
    if gtype == kw.POINT:
        if m and not z:        # payload is (x, y, m) — keep the M tag
            return kw.wkb_point(payload[0], payload[1], None, payload[2])
        return kw.wkb_point(*payload)
    return _PART_WRITER[gtype](payload, z, m)


def explode_collections(df: DataFrame, id_col: str = "doc_id",
                        wkb_col: str = "wkb") -> DataFrame:
    """One row per collection part: (id, part, gtype, npts, x0, y0,
    z0, wkb).  gtype is the PART's flat type; npts counts the part's
    vertices (polygon: exterior ring); (x0, y0[, z0]) is its first
    vertex (z0 NULL for 2-D input).  Handles Multi*,
    GeometryCollection (heterogeneous tagged parts),
    PolyhedralSurface/TIN (polygon/triangle parts), and every Z/M/ZM
    variant — part WKB keeps the input's ordinates."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[wkb_col]):
                gtype, z, m, payload = kw.parse_wkb_full(bytes(blob))
                if gtype in _SINGLE_OF:
                    single = _SINGLE_OF[gtype]
                    parts = [(single, p) for p in payload]
                elif gtype in kw._TAGGED:     # GC / MultiCurve members
                    parts = list(payload)     # keep each part's own tag
                else:
                    parts = [(gtype, payload)]
                if not parts:
                    rows.append({"doc_id": did, "part": 0, "gtype": 0,
                                 "npts": 0, "x0": None, "y0": None,
                                 "z0": None, "wkb": None})
                    continue
                for i, (ptype, p) in enumerate(parts):
                    if ptype == kw.POINT:
                        npts, v0 = 1, p
                    elif ptype in (kw.LINESTRING, kw.CIRCULARSTRING):
                        npts, v0 = len(p), p[0]
                    elif ptype in (kw.POLYGON, kw.TRIANGLE):
                        npts, v0 = len(p[0]), p[0][0]
                    else:                     # nested multi part (GC)
                        c = kw._all_coords(ptype, p)
                        npts, v0 = len(c), c[0]
                    rows.append({"doc_id": did, "part": i,
                                 "gtype": int(ptype), "npts": int(npts),
                                 "x0": float(v0[0]), "y0": float(v0[1]),
                                 "z0": float(v0[2]) if z else None,
                                 "wkb": _encode_part(ptype, p, z, m)})
            yield pd.DataFrame(rows)

    return df.select(id_col, wkb_col).mapInPandas(
        _batch, "doc_id long, part int, gtype int, npts int, "
                "x0 double, y0 double, z0 double, wkb binary")


def synth_multi_col_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder: deterministic Multi* WKB from doc_id formulas
    (doc_id%3 selects MultiPoint / MultiLineString / MultiPolygon), so
    the explode oracle can restate parts in SQL without parsing bytes."""
    import numpy as np

    def _mk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                k = did % 3
                if k == 0:
                    n = 1 + did % 4
                    pts = [(float(did % 100 + j), float((did * 3) % 100 - j))
                           for j in range(n)]
                    blob = kw.wkb_multipoint(pts)
                elif k == 1:
                    lines = []
                    for j in range(2):
                        lines.append(np.array(
                            [[j * 10 + did % 50 + i, i * (j + 1) + did % 20]
                             for i in range(3)], dtype=np.float64))
                    blob = kw.wkb_multilinestring(lines)
                else:
                    polys = []
                    for j in range(1 + did % 2):
                        bx, by = did % 50 + 5 * j, did % 30 + 3 * j
                        ring = np.array(
                            [[bx, by], [bx + 4, by], [bx, by + 3], [bx, by]],
                            dtype=np.float64)
                        polys.append([ring])
                    blob = kw.wkb_multipolygon(polys)
                rows.append({"doc_id": did, "wkb": blob})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(_mk, "doc_id long, wkb binary")


def synth_gc_z_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder: deterministic GeometryCollection-Z WKB from
    doc_id formulas — part 0 PointZ, part 1 LineStringZ (3 vertices),
    part 2 PolygonZ (one closed 4-vertex ring) — so the explode-Z
    oracle can restate every part relationally without parsing bytes.
    Exercises type 7 + the ISO +1000 Z offset end-to-end
    (ogr/ogr_core.h:405-519, ogrgeometryfactory.cpp:89-134)."""
    import numpy as np

    def _mk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                pt = kw.wkb_point(float(did % 100), float((did * 3) % 100),
                                  float(did % 7))
                line = kw.wkb_linestring(np.array(
                    [[did % 50 + i, did % 20 + 2 * i, did % 5 + i]
                     for i in range(3)], dtype=np.float64), z=True)
                bx, by, bz = did % 40, did % 30, did % 9
                ring = np.array(
                    [[bx, by, bz], [bx + 4, by, bz],
                     [bx, by + 3, bz], [bx, by, bz]], dtype=np.float64)
                poly = kw.wkb_polygon([ring], z=True)
                blob = kw.wkb_collection([pt, line, poly], z=True)
                rows.append({"doc_id": did, "wkb": blob})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(_mk, "doc_id long, wkb binary")


def synth_gc_zm_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture builder: deterministic GeometryCollection-ZM WKB (type
    3007) — part 0 PointZM, part 1 LineStringZM (3 vertices), part 2
    CircularStringZM (3 vertices, the curved member), part 3 PolygonZM
    (closed 4-vertex ring) — M formulas are distinct from Z so a
    swapped ordinate cannot hash-match.  Exercises the ISO +3000 ZM
    offset through parse -> explode -> re-encode end-to-end
    (ogr/ogr_core.h:405-519: wkbPointZM :491, wkbCircularStringZM
    :512)."""
    import numpy as np

    def _mk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                pt = kw.wkb_point(float(did % 100), float((did * 3) % 100),
                                  float(did % 7), float(did % 11))
                line = kw.wkb_linestring(np.array(
                    [[did % 50 + i, did % 20 + 2 * i,
                      did % 5 + i, did % 13 + 3 * i]
                     for i in range(3)], dtype=np.float64), z=True, m=True)
                arc = kw.wkb_circularstring(np.array(
                    [[did % 60 + i, did % 25 + i * i,
                      did % 6 + 2 * i, did % 17 + i]
                     for i in range(3)], dtype=np.float64), z=True, m=True)
                bx, by = did % 40, did % 30
                bz, bm = did % 9, did % 15
                ring = np.array(
                    [[bx, by, bz, bm], [bx + 4, by, bz, bm],
                     [bx, by + 3, bz, bm], [bx, by, bz, bm]],
                    dtype=np.float64)
                poly = kw.wkb_polygon([ring], z=True, m=True)
                blob = kw.wkb_collection([pt, line, arc, poly],
                                         z=True, m=True)
                rows.append({"doc_id": did, "wkb": blob})
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(_mk, "doc_id long, wkb binary")

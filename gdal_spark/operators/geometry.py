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
              kw.MULTIPOLYGON: kw.POLYGON}


def _encode_part(gtype: int, payload) -> bytes:
    if gtype == kw.POINT:
        return kw.wkb_point(payload[0], payload[1])
    if gtype == kw.LINESTRING:
        return kw.wkb_linestring(payload)
    return kw.wkb_polygon(payload)


def explode_collections(df: DataFrame, id_col: str = "doc_id",
                        wkb_col: str = "wkb") -> DataFrame:
    """One row per collection part: (id, part, gtype, npts, x0, y0,
    wkb).  gtype is the PART's flat type; npts counts the part's
    vertices (polygon: exterior ring); (x0, y0) is its first vertex."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[wkb_col]):
                gtype, payload = kw.parse_wkb(bytes(blob))
                if gtype in _SINGLE_OF:
                    single = _SINGLE_OF[gtype]
                    parts = [(single, p) for p in payload]
                else:
                    parts = [(gtype, payload)]
                if not parts:
                    rows.append({"doc_id": did, "part": 0, "gtype": 0,
                                 "npts": 0, "x0": None, "y0": None,
                                 "wkb": None})
                    continue
                for i, (ptype, p) in enumerate(parts):
                    if ptype == kw.POINT:
                        npts, x0, y0 = 1, p[0], p[1]
                    elif ptype == kw.LINESTRING:
                        npts, x0, y0 = len(p), p[0, 0], p[0, 1]
                    else:
                        npts, x0, y0 = len(p[0]), p[0][0, 0], p[0][0, 1]
                    rows.append({"doc_id": did, "part": i,
                                 "gtype": int(ptype), "npts": int(npts),
                                 "x0": float(x0), "y0": float(y0),
                                 "wkb": _encode_part(ptype, p)})
            yield pd.DataFrame(rows)

    return df.select(id_col, wkb_col).mapInPandas(
        _batch, "doc_id long, part int, gtype int, npts int, "
                "x0 double, y0 double, wkb binary")


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

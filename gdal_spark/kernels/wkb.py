"""Minimal WKB codec + header-only bbox scan.

Geometry travels through the engine as WKB bytes in a BinaryType
column end-to-end, mirroring the reference's fast path that computes
bboxes / pessimistic intersects directly on WKB without
deserialization (/root/reference/ogr/ogr_wkb.h:25-90).  Full
parse/build follows OGRGeometryFactory::createFromWkb semantics
(/root/reference/ogr/ogrgeometryfactory.cpp:89-134) for the 2-D
subset we support: Point(1), LineString(2), Polygon(3),
MultiPoint(4), MultiLineString(5), MultiPolygon(6).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6
CIRCULARSTRING = 8  # curved subset: same payload layout as LineString
MULTICURVE = 11     # GeometryCollection of curves (ogr_core.h:429)

_LE = 1  # little-endian byte-order marker; we always emit LE


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, POINT, x, y)


def _pack_ring(ring) -> bytes:
    a = np.ascontiguousarray(np.asarray(ring, dtype="<f8"))
    return struct.pack("<I", a.shape[0]) + a.tobytes()


def wkb_linestring(coords) -> bytes:
    return struct.pack("<BI", _LE, LINESTRING) + _pack_ring(coords)


def wkb_circularstring(coords) -> bytes:
    """CircularString WKB (type 8, ogr_core.h:422): arc triples, same
    body layout as LineString."""
    return struct.pack("<BI", _LE, CIRCULARSTRING) + _pack_ring(coords)


def wkb_polygon(rings) -> bytes:
    """rings: [outer, hole1, ...], each (M,2); rings are closed as-is
    (caller must pass first==last, as OGRLinearRing::closeRings does)."""
    body = struct.pack("<I", len(rings)) + b"".join(_pack_ring(r) for r in rings)
    return struct.pack("<BI", _LE, POLYGON) + body


def wkb_multipoint(points) -> bytes:
    body = struct.pack("<I", len(points)) + b"".join(
        wkb_point(float(x), float(y)) for x, y in points)
    return struct.pack("<BI", _LE, MULTIPOINT) + body


def wkb_multilinestring(lines) -> bytes:
    body = struct.pack("<I", len(lines)) + b"".join(
        wkb_linestring(ln) for ln in lines)
    return struct.pack("<BI", _LE, MULTILINESTRING) + body


def wkb_geom_type(data: bytes) -> int:
    """Read just the geometry-type id from the 5-byte WKB header
    (cheap dispatch; no payload parse)."""
    order = data[0]
    return struct.unpack_from("<I" if order == 1 else ">I", data, 1)[0]


def wkb_multicurve(parts) -> bytes:
    """MultiCurve WKB (type 11): parts are (gtype, coords) pairs with
    gtype in {LINESTRING, CIRCULARSTRING}."""
    body = struct.pack("<I", len(parts))
    for gtype, coords in parts:
        if gtype == LINESTRING:
            body += wkb_linestring(coords)
        elif gtype == CIRCULARSTRING:
            body += wkb_circularstring(coords)
        else:
            raise ValueError(f"unsupported MultiCurve part {gtype}")
    return struct.pack("<BI", _LE, MULTICURVE) + body


def wkb_multipolygon(polys) -> bytes:
    body = struct.pack("<I", len(polys)) + b"".join(wkb_polygon(p) for p in polys)
    return struct.pack("<BI", _LE, MULTIPOLYGON) + body


def _read_header(buf: memoryview, off: int):
    bo = buf[off]
    fmt = "<I" if bo == 1 else ">I"
    (gtype,) = struct.unpack_from(fmt, buf, off + 1)
    return bo == 1, gtype & 0xFF, off + 5


def parse_wkb(data: bytes):
    """Parse WKB -> (geom_type, payload).

    Point -> (1, (x, y)); LineString -> (2, ndarray (M,2));
    Polygon -> (3, [ndarray ring, ...]); Multi* -> (t, [parts...]).
    """
    geom, _ = _parse_at(memoryview(data), 0)
    return geom


def _parse_at(buf: memoryview, off: int):
    le, gtype, off = _read_header(buf, off)
    bo = "<" if le else ">"
    if gtype == POINT:
        x, y = struct.unpack_from(bo + "dd", buf, off)
        return (POINT, (x, y)), off + 16
    if gtype in (LINESTRING, CIRCULARSTRING):
        (n,) = struct.unpack_from(bo + "I", buf, off)
        a = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=off + 4)
        return (gtype, a.reshape(n, 2).astype(np.float64)), off + 4 + 16 * n
    if gtype == POLYGON:
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            a = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=off + 4)
            rings.append(a.reshape(n, 2).astype(np.float64))
            off += 4 + 16 * n
        return (POLYGON, rings), off
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        (np_,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        parts = []
        for _ in range(np_):
            part, off = _parse_at(buf, off)
            parts.append(part[1])
        return (gtype, parts), off
    if gtype == MULTICURVE:
        # parts keep their own type tag (LineString vs CircularString)
        (np_,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        parts = []
        for _ in range(np_):
            part, off = _parse_at(buf, off)
            parts.append(part)
        return (gtype, parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_bbox(data: bytes):
    """(minx, miny, maxx, maxy) scanned from WKB coords — the
    no-deserialize envelope of OGRWKBGetBoundingBox (ogr_wkb.h:30-34)."""
    gtype, payload = parse_wkb(data)
    if gtype == POINT:
        x, y = payload
        return x, y, x, y
    coords = _all_coords(gtype, payload)
    mn = coords.min(axis=0)
    mx = coords.max(axis=0)
    return float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1])


def _all_coords(gtype, payload):
    if gtype == POINT:
        return np.array([payload], dtype=np.float64)
    if gtype == LINESTRING:
        return payload
    if gtype == POLYGON:
        return np.vstack(payload)
    # multi*
    parts = []
    for p in payload:
        if isinstance(p, tuple):          # multipoint part
            parts.append(np.array([p], dtype=np.float64))
        elif isinstance(p, list):         # multipolygon part
            parts.append(np.vstack(p))
        else:
            parts.append(p)
    return np.vstack(parts)


def polygon_rings(data: bytes):
    """Rings of a Polygon/MultiPolygon WKB as [ndarray (M,2), ...]
    (multipolygon rings concatenated; first ring of each part is its
    outer ring)."""
    gtype, payload = parse_wkb(data)
    if gtype == POLYGON:
        return payload
    if gtype == MULTIPOLYGON:
        return [r for poly in payload for r in poly]
    raise ValueError(f"not a polygon WKB (type {gtype})")


def parse_wkt_point(wkt: str):
    """'POINT(x y)' -> (x, y); the docs fixture stores geo spans this way."""
    inner = wkt[wkt.index("(") + 1:wkt.rindex(")")]
    xs, ys = inner.split()
    return float(xs), float(ys)

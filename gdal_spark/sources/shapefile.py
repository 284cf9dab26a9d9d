"""ESRI Shapefile reader — pure-python binary parsing, distributed by
.shx record ranges.

Format per the public ESRI Shapefile Technical Description (July
1998) as implemented by the reference driver
(/root/reference/ogr/ogrsf_frmts/shape/shapefil.h, shpopen.c,
dbfopen.c): 100-byte .shp header (big-endian file code 9994 /
length, little-endian version 1000 / shape type / bbox), records as
(big-endian record number + content length) followed by the
little-endian shape; .shx holds (offset, length) pairs in 16-bit
words; .dbf is dBASE III (header record count/size, 32-byte field
descriptors, fixed-width text records).

Scale shape: the .shx index (8 bytes/record) is read DRIVER-side and
cut into record ranges; each task seeks straight to its byte range of
.shp/.dbf — one large shapefile parallelizes across the cluster
without any task reading the whole file.  Z/M coordinates are parsed
past but dropped (XY engine, like the SURVEY's SRS bounds).

Ring grouping for type-5 polygons follows the spec: clockwise rings
open a new polygon, counter-clockwise rings are holes of the last
opened one (the reference's organizePolygons default heuristic for
well-formed files).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels import wkb as kwkb

_SHP_NULL, _SHP_POINT, _SHP_ARC, _SHP_POLYGON, _SHP_MULTIPOINT = 0, 1, 3, 5, 8


def _base(stype: int) -> int:
    """Z (11,13,15,18) and M (21,23,25,28) variants share the XY
    layout prefix; reduce to the base type."""
    return {11: 1, 13: 3, 15: 5, 18: 8,
            21: 1, 23: 3, 25: 5, 28: 8}.get(stype, stype)


def _ring_is_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0.0


def _shape_to_wkb(buf: bytes) -> bytes | None:
    stype = struct.unpack_from("<i", buf, 0)[0]
    b = _base(stype)
    if b == _SHP_NULL:
        return None
    if b == _SHP_POINT:
        x, y = struct.unpack_from("<2d", buf, 4)
        return kwkb.wkb_point(x, y)
    if b == _SHP_MULTIPOINT:
        n = struct.unpack_from("<i", buf, 36)[0]
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n,
                            offset=40).reshape(n, 2)
        body = struct.pack("<BII", 1, kwkb.MULTIPOINT, n) + b"".join(
            kwkb.wkb_point(*p) for p in pts)
        return body
    # arc / polygon: bbox(32) numParts numPoints parts[] points[]
    n_parts, n_pts = struct.unpack_from("<2i", buf, 36)
    parts = np.frombuffer(buf, dtype="<i4", count=n_parts, offset=44)
    pts = np.frombuffer(buf, dtype="<f8", count=2 * n_pts,
                        offset=44 + 4 * n_parts).reshape(n_pts, 2)
    rings = [pts[parts[i]:(parts[i + 1] if i + 1 < n_parts else n_pts)]
             for i in range(n_parts)]
    if b == _SHP_ARC:
        if len(rings) == 1:
            return kwkb.wkb_linestring(rings[0])
        return struct.pack("<BII", 1, kwkb.MULTILINESTRING,
                           len(rings)) + b"".join(
            kwkb.wkb_linestring(r) for r in rings)
    # polygon: group rings into polygons (CW opens, CCW is a hole)
    polys: list[list[np.ndarray]] = []
    for ring in rings:
        if _ring_is_cw(ring) or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    if len(polys) == 1:
        return kwkb.wkb_polygon(polys[0])
    return kwkb.wkb_multipolygon(polys)


def _dbf_fields(path: str):
    with open(path, "rb") as f:
        head = f.read(32)
        n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", head, 4)
        fields = []
        off = 1                                   # deletion flag
        while True:
            fd = f.read(32)
            if not fd or fd[0] == 0x0D:
                break
            name = fd[:11].split(b"\x00")[0].decode("ascii")
            ftype = chr(fd[11])
            flen = fd[16]
            fdec = fd[17]
            fields.append((name, ftype, off, flen, fdec))
            off += flen
    return n_rec, hdr_size, rec_size, fields


def _decode_field(raw: bytes, ftype: str, fdec: int):
    s = raw.decode("ascii", "replace").strip()
    if ftype in ("N", "F"):
        if not s:
            return None
        return float(s) if (fdec > 0 or ftype == "F") else int(float(s))
    if ftype == "L":
        return s in ("Y", "y", "T", "t") if s else None
    return s or None


def read_shapefile(spark: SparkSession, path: str,
                   n_partitions: int = 32) -> DataFrame:
    """path: the .shp file (companion .shx/.dbf beside it).  Returns
    DF(fid, wkb, xmin, ymin, xmax, ymax, <dbf attributes...>)."""
    shx = path[:-4] + ".shx"
    dbf = path[:-4] + ".dbf"
    with open(shx, "rb") as f:
        raw = f.read()
    n_rec = (len(raw) - 100) // 8
    idx = np.frombuffer(raw, dtype=">i4", count=2 * n_rec,
                        offset=100).reshape(n_rec, 2)
    offsets = idx[:, 0] * 2                      # 16-bit words -> bytes
    lengths = idx[:, 1] * 2
    dbf_nrec, dbf_hdr, dbf_rsize, fields = _dbf_fields(dbf)

    step = max(1, -(-n_rec // n_partitions))
    ranges = [(i, min(i + step, n_rec)) for i in range(0, n_rec, step)]
    rng_df = spark.createDataFrame(
        pd.DataFrame(ranges, columns=["rec0", "rec1"]))
    offs_b = spark.sparkContext.broadcast((offsets.tolist(),
                                           lengths.tolist()))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs, lens = offs_b.value
        for pdf in batches:
            for _, rr in pdf.iterrows():
                r0, r1 = int(rr["rec0"]), int(rr["rec1"])
                rows = []
                with open(path, "rb") as fshp, open(dbf, "rb") as fdbf:
                    fdbf.seek(dbf_hdr + dbf_rsize * r0)
                    dbf_chunk = fdbf.read(dbf_rsize * (r1 - r0))
                    for rec in range(r0, r1):
                        fshp.seek(offs[rec] + 8)
                        wkb = _shape_to_wkb(fshp.read(lens[rec]))
                        if wkb is None:
                            bbox = (None, None, None, None)
                        else:
                            bbox = kwkb.wkb_bbox(wkb)
                        drec = dbf_chunk[(rec - r0) * dbf_rsize:
                                         (rec - r0 + 1) * dbf_rsize]
                        attrs = {
                            name: _decode_field(
                                drec[off:off + flen], ftype, fdec)
                            for name, ftype, off, flen, fdec in fields}
                        rows.append({"fid": rec, "wkb": wkb,
                                     "xmin": bbox[0], "ymin": bbox[1],
                                     "xmax": bbox[2], "ymax": bbox[3],
                                     **attrs})
                yield pd.DataFrame(rows)

    def _sql_type(ftype: str, fdec: int) -> str:
        if ftype in ("N", "F"):
            return "double" if (fdec > 0 or ftype == "F") else "long"
        if ftype == "L":
            return "boolean"
        return "string"

    schema = ("fid long, wkb binary, xmin double, ymin double, "
              "xmax double, ymax double")
    for name, ftype, _off, _flen, fdec in fields:
        schema += f", {name} {_sql_type(ftype, fdec)}"
    return rng_df.mapInPandas(_scan, schema)

"""GeoPackage (OGC 12-128r14) reader via the Python stdlib sqlite3 —
distributed by rowid ranges.

The reference's driver (/root/reference/ogr/ogrsf_frmts/gpkg/) reads
features through SQLite; here the DRIVER opens the file once to list
feature tables (``gpkg_contents`` / ``gpkg_geometry_columns``) and
count rows, then each task opens the file read-only and scans its own
``rowid`` range — SQLite b-tree range scans make the split cheap, so
one large .gpkg parallelizes without coordination.

Geometry BLOBs carry the GeoPackageBinaryHeader (magic 'GP', version,
flags with a 3-bit envelope indicator, srs_id) followed by standard
WKB (spec §2.1.3 / the reference's GPkgHeaderFromWKB) — the header is
stripped and the envelope, when present, reused as the bbox without
re-parsing the WKB.
"""

from __future__ import annotations

import sqlite3
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels import wkb as kwkb

_ENV_SIZE = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def gpkg_blob_to_wkb(blob: bytes):
    """Returns (wkb, bbox|None); None for empty/null geometries."""
    if blob is None or len(blob) < 8 or blob[0:2] != b"GP":
        return None, None
    flags = blob[3]
    if flags & 0x20:                   # ExtendedGeoPackageBinary: a
        return None, None              # 4-byte extension code precedes
                                       # the WKB; not parseable here
    if flags & 0x10:                   # empty-geometry flag
        return None, None
    env_type = (flags >> 1) & 0x07
    env_size = _ENV_SIZE.get(env_type)
    if env_size is None:
        return None, None
    off = 8
    bbox = None
    if env_size:
        little = bool(flags & 0x01)
        fmt = "<4d" if little else ">4d"
        minx, maxx, miny, maxy = struct.unpack_from(fmt, blob, off)
        bbox = (minx, miny, maxx, maxy)
        off += env_size
    wkb = blob[off:]
    if bbox is None and wkb:
        bbox = kwkb.wkb_bbox(wkb)
    return wkb, bbox


def list_feature_tables(path: str) -> list[str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY table_name").fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def read_geopackage(spark: SparkSession, path: str,
                    table: str | None = None,
                    n_partitions: int = 32) -> DataFrame:
    """Returns DF(fid, wkb, xmin, ymin, xmax, ymax, <attributes...>)
    for one feature table (default: the first in gpkg_contents)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if table is None:
            tables = list_feature_tables(path)
            if not tables:
                raise ValueError("no feature tables in gpkg_contents")
            table = tables[0]
        geom_col = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (table,)).fetchone()[0]
        cols = [r[1] for r in con.execute(f'PRAGMA table_info("{table}")')]
        # the feature id comes from rowid (== the INTEGER PRIMARY KEY
        # when one exists), so drop a same-named attribute column
        attr_cols = [c for c in cols
                     if c != geom_col and c.lower() != "fid"]
        types = {r[1]: (r[2] or "").upper()
                 for r in con.execute(f'PRAGMA table_info("{table}")')}
        lo, hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{table}"').fetchone()
    finally:
        con.close()
    if lo is None:
        lo, hi = 0, -1

    step = max(1, -(-(hi - lo + 1) // n_partitions))
    ranges = [(r, min(r + step - 1, hi)) for r in range(lo, hi + 1, step)]
    if not ranges:
        ranges = [(0, -1)]
    rng_df = spark.createDataFrame(
        pd.DataFrame(ranges, columns=["lo", "hi"]))

    sel = ", ".join(f'"{c}"' for c in attr_cols)

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, rr in pdf.iterrows():
                con2 = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    cur = con2.execute(
                        f'SELECT rowid, "{geom_col}"'
                        + (", " + sel if sel else "")
                        + f' FROM "{table}" WHERE rowid BETWEEN ? AND ?',
                        (int(rr["lo"]), int(rr["hi"])))
                    rows = []
                    for rec in cur:
                        wkb, bbox = gpkg_blob_to_wkb(rec[1])
                        bbox = bbox or (None, None, None, None)
                        row = {"fid": rec[0], "wkb": wkb,
                               "xmin": bbox[0], "ymin": bbox[1],
                               "xmax": bbox[2], "ymax": bbox[3]}
                        row.update(dict(zip(attr_cols, rec[2:])))
                        rows.append(row)
                finally:
                    con2.close()
                yield pd.DataFrame(rows, columns=[
                    "fid", "wkb", "xmin", "ymin", "xmax", "ymax",
                    *attr_cols])

    def _sql_type(c: str) -> str:
        t = types.get(c, "")
        if "INT" in t:
            return "long"
        if t in ("REAL", "FLOAT", "DOUBLE"):
            return "double"
        return "string"

    schema = ("fid long, wkb binary, xmin double, ymin double, "
              "xmax double, ymax double")
    for c in attr_cols:
        schema += f", {c} {_sql_type(c)}"
    return rng_df.mapInPandas(_scan, schema)

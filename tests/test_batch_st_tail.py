"""Batch-vs-scalar parity for the round-5 ST tail batching
(_st_astext / _st_issimple / _st_isvalid / _st_geomfromwkb /
_st_boundary): the chains-batch fast path must produce byte/value
identical results to the per-row path it replaces.  The per-row path
is forced by appending a CircularString row (outside _CHAIN_TYPES,
so _chains_by_row returns None for that batch)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.functions import st as fst
from gdal_spark.kernels import wkb as kw


def _circularstring():
    # minimal CircularString WKB: LE, type 8, 3 points
    import struct
    pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
    return (b"\x01" + struct.pack("<I", 8) + struct.pack("<I", 3)
            + b"".join(struct.pack("<dd", *p) for p in pts))


SQ = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
               [0.0, 0.0]])
HOLE = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0],
                 [1.0, 1.0]])
BOWTIE = np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0],
                   [0.0, 0.0]])
OPEN_RING = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.5]])
ESCAPED = HOLE + 10.0

FIXTURE = [
    kw.wkb_point(1.25, -2.5),
    kw.wkb_point(float("nan"), 0.0),
    None,
    kw.wkb_linestring(np.array([[0.0, 0.0], [1.5, 2.5], [3.0, 0.0]])),
    kw.wkb_linestring(SQ),                               # closed line
    kw.wkb_linestring(np.empty((0, 2))),                 # empty line
    kw.wkb_linestring(BOWTIE[:-1]),                      # self-crossing
    kw.wkb_polygon([SQ]),
    kw.wkb_polygon([SQ, HOLE]),
    kw.wkb_polygon([BOWTIE]),                            # invalid: bowtie
    kw.wkb_polygon([OPEN_RING]),                         # invalid: open
    kw.wkb_polygon([SQ, ESCAPED]),                       # invalid: hole out
    kw.wkb_multipoint([(0.0, 1.0), (2.0, 3.0)]),
    kw.wkb_multipoint([]),
    kw.wkb_multilinestring([SQ[:3], HOLE[:4]]),
    kw.wkb_multipolygon([[SQ], [HOLE]]),
    kw.wkb_multipolygon([[SQ, HOLE], [BOWTIE]]),
    kw.wkb_point(7.0, 8.0, z=3.0),                       # Z projects to 2-D
]


def _triangle():
    # TRIANGLE WKB (type 17): one closed 3-vertex ring — outside
    # _CHAIN_TYPES but supported by the scalar boundary path
    import struct
    ring = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (0.0, 0.0)]
    return (b"\x01" + struct.pack("<I", 17) + struct.pack("<I", 1)
            + struct.pack("<I", 4)
            + b"".join(struct.pack("<dd", *p) for p in ring))


def _both(fn, vals, *extra, forcer=None):
    """Run fn on the batch (fast path) and on batch+forcer
    (forces the per-row path); return aligned outputs."""
    s_fast = pd.Series(vals, dtype=object)
    s_slow = pd.Series(list(vals) + [forcer or _circularstring()],
                       dtype=object)
    args_f = [pd.Series(list(e), dtype=object) for e in extra]
    args_s = [pd.Series(list(e) + [e[-1]], dtype=object) for e in extra]
    fast = fn(s_fast, *args_f)
    slow = fn(s_slow, *args_s)
    assert fst._chains_by_row(list(s_slow)) is None  # fallback forced
    return list(fast), list(slow)[: len(vals)]


def test_astext_parity():
    fast, slow = _both(fst._st_astext, FIXTURE)
    assert fast == slow
    assert fast[0] == "POINT (1.25 -2.5)"
    assert fast[2] is None
    assert fast[8].startswith("POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,")


def test_issimple_parity():
    fast, slow = _both(fst._st_issimple, FIXTURE)
    assert fast == slow
    assert fast[6] is False            # self-crossing open line
    assert fast[9] is False            # bowtie ring
    assert fast[7] is True


def test_isvalid_parity():
    fast, slow = _both(fst._st_isvalid, FIXTURE)
    assert fast == slow
    assert fast[8] is True             # square with hole
    assert fast[9] is False            # bowtie
    assert fast[10] is False           # open ring
    assert fast[11] is False           # escaped hole
    assert fast[16] is False           # multipolygon w/ bad member


def test_geomfromwkb_parity_and_passthrough():
    fast, slow = _both(fst._st_geomfromwkb, FIXTURE)
    assert fast == slow
    # canonical single-header blobs pass through byte-identical
    assert fast[0] == FIXTURE[0]
    assert fast[7] == FIXTURE[7]
    # Z point re-encodes to the canonical 2-D form, not passthrough
    assert fast[17] == kw.wkb_point(7.0, 8.0)
    assert fast[17] != bytes(FIXTURE[17])


def test_boundary_parity():
    fast, slow = _both(fst._st_boundary, FIXTURE, forcer=_triangle())
    assert fast == slow
    assert fast[7] == kw.wkb_linestring(SQ)              # shell only
    assert fast[4] == kw.wkb_multipoint([])              # closed line
    assert fast[0] == kw.wkb_collection([])              # point


def test_geomfromwkb_garbage_row_is_null():
    vals = [kw.wkb_point(1.0, 2.0), b"\x01\xff\xff", None]
    out = list(fst._st_geomfromwkb(pd.Series(vals, dtype=object)))
    assert out[0] == vals[0]
    assert out[1] is None
    assert out[2] is None


def test_big_endian_batch_still_exact():
    # a big-endian point flows through _scan_slow inside the decoder
    import struct
    be_pt = (b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0))
    vals = [kw.wkb_point(1.0, 2.0), be_pt]
    txt = list(fst._st_astext(pd.Series(vals, dtype=object)))
    assert txt == ["POINT (1 2)", "POINT (3 4)"]
    rt = list(fst._st_geomfromwkb(pd.Series(vals, dtype=object)))
    assert rt[1] == kw.wkb_point(3.0, 4.0)   # canonicalized to LE


@pytest.mark.parametrize("n", [64, 512])
def test_uniform_point_layer_batch(n):
    rng = np.random.default_rng(7)
    pts = [kw.wkb_point(float(x), float(y))
           for x, y in rng.uniform(-10, 10, (n, 2))]
    s = pd.Series(pts, dtype=object)
    txt = fst._st_astext(s)
    assert txt[0] == f"POINT ({rng2str(pts[0])})"
    assert (fst._st_issimple(s) == True).all()           # noqa: E712
    assert (fst._st_isvalid(s) == True).all()            # noqa: E712
    assert list(fst._st_geomfromwkb(s)) == pts


def rng2str(blob):
    t, p = kw.parse_wkb(bytes(blob))
    return f"{p[0]:.15g} {p[1]:.15g}"

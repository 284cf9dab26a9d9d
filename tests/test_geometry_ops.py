"""explode_collections (operators/geometry.py): part WKB roundtrip +
passthrough semantics."""

import numpy as np

from gdal_spark.kernels import wkb as kw
from gdal_spark.operators import geometry as ge


def test_explode_multipolygon_roundtrip(spark):
    tri1 = np.array([[0, 0], [4, 0], [0, 3], [0, 0]], dtype=np.float64)
    tri2 = np.array([[10, 10], [14, 10], [10, 13], [10, 10]],
                    dtype=np.float64)
    blob = kw.wkb_multipolygon([[tri1], [tri2]])
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "doc_id long, wkb binary")
    rows = sorted(ge.explode_collections(df).collect(),
                  key=lambda r: r["part"])
    assert [r["part"] for r in rows] == [0, 1]
    assert all(r["gtype"] == kw.POLYGON for r in rows)
    # each part re-encodes as a standalone Polygon WKB
    t0, rings0 = kw.parse_wkb(bytes(rows[0]["wkb"]))
    assert t0 == kw.POLYGON
    np.testing.assert_array_equal(rings0[0], tri1)
    t1, rings1 = kw.parse_wkb(bytes(rows[1]["wkb"]))
    np.testing.assert_array_equal(rings1[0], tri2)


def test_explode_passthrough_non_collection(spark):
    # nIters = 1 for non-collections (ogr2ogr_lib.cpp:6569)
    blob = kw.wkb_linestring(np.array([[0, 0], [5, 5]], dtype=np.float64))
    df = spark.createDataFrame([(7, bytearray(blob))],
                               "doc_id long, wkb binary")
    rows = ge.explode_collections(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["part"], r["gtype"], r["npts"]) == (0, kw.LINESTRING, 2)
    assert kw.parse_wkb(bytes(r["wkb"]))[0] == kw.LINESTRING


def test_explode_empty_collection_emits_null_row(spark):
    # nIters = max(1, nParts): empty Multi* still yields one row
    blob = kw.wkb_multipoint([])
    df = spark.createDataFrame([(3, bytearray(blob))],
                               "doc_id long, wkb binary")
    rows = ge.explode_collections(df).collect()
    assert len(rows) == 1 and rows[0]["wkb"] is None
    assert rows[0]["npts"] == 0


def test_synth_fixture_kinds(spark):
    docs = spark.range(0, 9).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: kw.wkb_geom_type(bytes(r["wkb"]))
           for r in ge.synth_multi_col_rows(docs).collect()}
    assert out[0] == kw.MULTIPOINT
    assert out[1] == kw.MULTILINESTRING
    assert out[2] == kw.MULTIPOLYGON

"""Spatial join vs brute-force oracle + span-sequence invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels import pip as kpip
from gdal_spark.kernels import wkb as kwkb
from gdal_spark.kernels.cells import TileGrid
from gdal_spark.operators.spatial_join import extract_geo_points, spatial_join
from gdal_spark.sources import fixtures as fx

N_DOCS = 2000


@pytest.fixture(scope="module")
def data(spark):
    docs_pdf = fx.docs_pandas(N_DOCS)
    polys_pdf = fx.polygons_pandas()
    docs = spark.createDataFrame(docs_pdf).cache()
    polys = spark.createDataFrame(polys_pdf).cache()
    grid = TileGrid.local(*fx.POLY_BBOX)
    # brute-force oracle: every (doc, polygon) PIP pair
    pts = extract_geo_points(docs).select("doc_id", "x", "y").toPandas()
    want = set()
    for _, prow in polys_pdf.iterrows():
        rings = kwkb.polygon_rings(prow["wkb"])
        inside = kpip.points_in_polygon(
            pts["x"].to_numpy(), pts["y"].to_numpy(), rings)
        for did in pts["doc_id"].to_numpy()[inside]:
            want.add((did, int(prow["fid"])))
    return docs, polys, grid, pts, want


def _got_pairs(joined):
    return {(r["doc_id"], r["fid"]) for r in joined.select("doc_id", "fid").collect()}


def test_join_matches_bruteforce_oracle(data):
    docs, polys, grid, pts, want = data
    joined = spatial_join(extract_geo_points(docs), polys, grid, zoom=6)
    assert _got_pairs(joined) == want
    assert len(want) > 100  # fixture sanity: plenty of positives


def test_salted_shuffle_join_equals_broadcast(data):
    docs, polys, grid, pts, want = data
    joined = spatial_join(extract_geo_points(docs), polys, grid, zoom=6,
                          broadcast=False, salt=4)
    assert _got_pairs(joined) == want


def test_first_match_cardinality(data):
    docs, polys, grid, pts, want = data
    joined = spatial_join(extract_geo_points(docs), polys, grid, zoom=6,
                          first_match=True)
    got = joined.select("doc_id", "fid").collect()
    by_doc = {}
    for r in got:
        assert r["doc_id"] not in by_doc, "first_match must emit one row per point"
        by_doc[r["doc_id"]] = r["fid"]
    # each emitted fid is the minimum matching fid (OGR first-match order)
    min_fid = {}
    for did, fid in want:
        min_fid[did] = min(min_fid.get(did, fid), fid)
    assert by_doc == min_fid


def test_left_join_keeps_unmatched(data):
    docs, polys, grid, pts, want = data
    joined = spatial_join(extract_geo_points(docs), polys, grid, zoom=6, how="left")
    matched_docs = {d for d, _ in want}
    rows = joined.select("doc_id", "fid").collect()
    unmatched = {r["doc_id"] for r in rows if r["fid"] is None}
    assert unmatched == {f"doc-{i:09d}" for i in range(N_DOCS)} - matched_docs


def test_span_sequence_invariant(data):
    """Per-doc (kind, text, media_ref, order) must survive the join
    byte-for-byte (BASELINE.json input_hint invariant)."""
    docs, polys, grid, pts, want = data
    joined = spatial_join(extract_geo_points(docs), polys, grid, zoom=6,
                          first_match=True)
    inp = {r["doc_id"]: r["spans"] for r in docs.collect()}
    out = {r["doc_id"]: r["spans"] for r in joined.select("doc_id", "spans").collect()}
    assert out, "join produced no rows"
    for did, spans in out.items():
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in inp[did]
        ]


def test_zoom_invariance(data):
    """The coarse-phase zoom must not change the result (only the plan)."""
    docs, polys, grid, pts, want = data
    for z in (4, 8):
        joined = spatial_join(extract_geo_points(docs), polys, grid, zoom=z)
        assert _got_pairs(joined) == want


def test_negatives_outside_bbox_never_match(data):
    docs, polys, grid, pts, want = data
    minx, miny, maxx, maxy = fx.POLY_BBOX
    outside = pts[(pts["x"] > maxx) | (pts["y"] > maxy)]
    assert len(outside) > 0
    matched_docs = {d for d, _ in want}
    assert not (set(outside["doc_id"]) & matched_docs)


def test_auto_salt_and_broadcast_agree(spark):
    """salt='auto' on the hot-cell fixture (20% of docs in 3 hot
    squares) must return exactly the unsalted result."""
    from pyspark.sql import functions as F

    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.spatial_join import extract_geo_points, spatial_join
    from gdal_spark.sources import fixtures as fx

    docs = spark.createDataFrame(fx.docs_pandas(3000))
    polys = spark.createDataFrame(fx.polygons_pandas())
    grid = TileGrid.local(*fx.POLY_BBOX)
    pts = extract_geo_points(docs).select("doc_id", "x", "y")

    plain = spatial_join(pts, polys, grid, zoom=6)
    auto = spatial_join(pts, polys, grid, zoom=6, salt="auto",
                        broadcast=False)
    a = {(r["doc_id"], r["fid"]) for r in plain.select("doc_id", "fid").collect()}
    b = {(r["doc_id"], r["fid"]) for r in auto.select("doc_id", "fid").collect()}
    assert a == b and len(a) > 0


def test_exact_pandas_path_matches_column(data):
    """The cogrouped Arrow exact phase (bit-match demo path) must
    produce the same pairs as the JVM aggregate() path."""
    docs, polys, grid, pts, want = data
    joined = spatial_join(extract_geo_points(docs), polys, grid, zoom=6,
                          exact="pandas")
    assert _got_pairs(joined) == want


def test_prepare_edges_reused_across_calls(data):
    """A prepared (persisted) edge table must serve repeated joins on
    the same polygon layer from cache: the second call's plan reads
    InMemoryTableScan instead of launching a second Python edge stage,
    and results stay identical to the per-call build."""
    from gdal_spark.operators.spatial_join import prepare_edges

    docs, polys, grid, pts, want = data
    edges = prepare_edges(polys)
    try:
        j1 = spatial_join(extract_geo_points(docs), polys, grid, zoom=6,
                          edges=edges)
        assert _got_pairs(j1) == want  # materializes the cache
        j2 = spatial_join(extract_geo_points(docs), polys, grid, zoom=6,
                          edges=edges)
        plan = j2._jdf.queryExecution().toString()
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
        assert _got_pairs(j2) == want
    finally:
        edges.unpersist()


def test_edges_table_distributed_100k(spark):
    """Edge-table construction is a distributed mapInPandas, never a
    driver collect: a 100k-polygon layer must decode on executors.
    (Round-1 wrong #3: polys.collect() per call.)"""
    import pandas as pd

    from gdal_spark.operators.spatial_join import edges_table

    n = 100_000
    wkbs = []
    for i in range(n):
        x0, y0 = float(i % 1000), float(i // 1000)
        ring = [(x0, y0), (x0 + 1, y0), (x0 + 1, y0 + 1), (x0, y0 + 1),
                (x0, y0)]
        wkbs.append(kwkb.wkb_polygon([ring]))
    polys = spark.createDataFrame(
        pd.DataFrame({"fid": np.arange(n, dtype=np.int64), "wkb": wkbs})
    ).repartition(8)
    et = edges_table(polys)
    agg = et.select(
        F.count("*").alias("n"), F.sum(F.size("edges")).alias("ne")).collect()[0]
    assert agg["n"] == n
    assert agg["ne"] == 4 * n  # one closed square ring -> 4 edges


def test_s2_join_parity_with_quadtree(spark):
    """The S2-keyed and quadtree-keyed joins are two candidate
    generators over the SAME exact phase — outputs must be row-equal."""
    from pyspark.sql import functions as F

    from gdal_spark.kernels.cells import TileGrid
    from gdal_spark.operators.spatial_join import (spatial_join,
                                                   spatial_join_s2)
    from gdal_spark.queries import _derive as dv
    from gdal_spark.queries.spatial import _scaled_fixture

    pts, polys = _scaled_fixture(spark, "/root/testdata/sf0.001")
    s2_rows = sorted((r["doc_id"], r["fid"]) for r in
                     spatial_join_s2(pts, polys, level=8).collect())
    grid = TileGrid.local(-1.2, -1.0, 1.2, 1.0, tile_size=256)
    qt_rows = sorted((r["doc_id"], r["fid"]) for r in
                     spatial_join(pts, polys, grid, zoom=5).collect())
    assert s2_rows == qt_rows and len(s2_rows) > 0

    # first_match parity too (lowest fid per point)
    s2_fm = sorted((r["doc_id"], r["fid"]) for r in
                   spatial_join_s2(pts, polys, level=8,
                                   first_match=True).collect())
    qt_fm = sorted((r["doc_id"], r["fid"]) for r in
                   spatial_join(pts, polys, grid, zoom=5,
                                first_match=True).collect())
    assert s2_fm == qt_fm

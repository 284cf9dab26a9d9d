"""Catalog integrity + a fast correctness sample vs the DuckDB oracle.

The driver runs the full battery at sf0.01; here we sanity-run a
representative subset at sf0.001 so `pytest -x -q` stays quick while
still exercising both halves of each registered pair.
"""

from __future__ import annotations

import os

import pytest

from gdal_spark.oracle import check_query, connect_oracle
from gdal_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

SAMPLE = [
    "select_where_order",
    "summary_aggregates",
    "left_join_first_match",
    "cell_encode",
    "hilbert_key",
    "pip_join",
    "knn",
]


def test_catalog_shape():
    assert len(QUERIES) >= 20
    for name, q in QUERIES.items():
        assert callable(q.fn), name
        sql = q.resolve_sql()
        assert sql is None or "SELECT" in sql.upper(), name


def test_oracle_sql_parses():
    con = connect_oracle(SF_DIR)
    for name, q in QUERIES.items():
        sql = q.resolve_sql()
        if sql is not None:
            con.sql(f"SELECT * FROM ({sql}) LIMIT 0")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, name):
    con = connect_oracle(SF_DIR)
    problems = check_query(spark, con, QUERIES[name], SF_DIR)
    assert not problems, problems


def test_contour_polygons_bands(spark):
    """gdal_contour -p composition: bands are one component each with
    the expected annulus geometry (hole in the centre band from the
    planted square)."""
    from gdal_spark.queries import QUERIES

    rows = QUERIES["contour_polygons"].fn(spark, "/root/testdata/sf0.001") \
        .collect()
    got = {r["value"]: (r["pixel_count"], r["n_rings"]) for r in rows}
    # closed forms: centre square 15^2 minus 4x4 hole; annuli side
    # (2w-1)^2 differences; frame 65^2-47^2; planted 4x4
    assert got[1] == (15 * 15 - 16, 2)
    assert got[2] == (31 * 31 - 15 * 15, 2)
    assert got[3] == (47 * 47 - 31 * 31, 2)
    assert got[4] == (65 * 65 - 47 * 47, 2)
    assert got[5] == (16, 1)

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

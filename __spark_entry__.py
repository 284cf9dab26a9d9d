"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship two-phase spatial join at sf0.001 (smoke).
``queries`` — every implemented operator from SURVEY.md §2, as
              (spark, sf_dir) -> DataFrame callables.
``oracle_sql`` — the DuckDB twin of each query (omitted entries get
              the weaker rows-only check).

The catalog itself lives in gdal_spark/queries/ — one module per
operator family, each entry registered with both halves.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cell-indexed point-in-polygon join of derived doc
    points against the fixture polygon layer at sf0.001."""
    return QUERIES["pip_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, q in QUERIES.items():
        sql = q.resolve_sql()
        if sql is not None:
            out[name] = sql
    return out

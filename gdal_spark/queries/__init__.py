"""Query catalog: every implemented operator exposed as a (Spark
callable, DuckDB oracle SQL) pair.

This is the correctness surface of the engine: the driver runs each
``QUERIES[name].fn(spark, sf_dir)`` next to ``QUERIES[name].sql`` on
the same parquet tables and compares row count + schema + sorted
value hash.  Queries with ``sql=None`` are non-SQL-expressible
(stateful/iterative) and get a rows-only check.

Conventions (all enforced here so every query survives the hash
compare):

* every computed column is aliased identically in Spark and SQL;
* float aggregates are rounded to a fixed scale in BOTH engines so
  summation-order differences cannot flip the hash;
* any ORDER BY feeding a LIMIT carries a unique tie-break key;
* derived spatial coordinates use pure integer arithmetic scaled by
  IEEE-double constants so both engines compute bit-identical values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | Callable[[], str] | None
    desc: str = ""

    def resolve_sql(self) -> str | None:
        """sql may be a zero-arg callable (serial-golden oracles that
        compute a VALUES table from the numpy kernels — _goldens.py);
        resolve it to the final string once, lazily."""
        if callable(self.sql):
            self.sql = self.sql()
        return self.sql


QUERIES: dict[str, Q] = {}


def register(name: str, sql: str | Callable[[], str] | None = None,
             desc: str = ""):
    def deco(fn):
        QUERIES[name] = Q(fn, sql, desc)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Importing submodules populates QUERIES.
from . import relational  # noqa: E402,F401
from . import spatial  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import raster  # noqa: E402,F401
from . import algebra  # noqa: E402,F401
from . import gridding  # noqa: E402,F401

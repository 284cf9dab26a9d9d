"""DuckDB-oracle comparison used by scripts/check.py and the tests.

Mirrors the driver's correctness gate: row count + column-name set +
order-insensitive exact value compare (columns sorted by name, rows
sorted), predicting the driver's value-hash verdict.
"""

from __future__ import annotations

import math

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def connect_oracle(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tname}.parquet')"
        )
    return con


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def compare(spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    """Empty list == the driver's hash compare would pass."""
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(
            f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        problems.append(
            f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
    if problems:
        return problems
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted(tuple(norm(r[i]) for i in order) for r in spark_rows)
    d = sorted(tuple(norm(r[i]) for i in dorder) for r in duck_rows)
    nbad = 0
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            if nbad < 3:
                problems.append(f"row {i}: spark={a} duck={b}")
            nbad += 1
    if nbad:
        problems.append(f"... {nbad} mismatched rows of {len(s)}")
    return problems


def check_query(spark, con, q, sf_dir: str) -> list[str]:
    df = q.fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if q.sql is None:
        return []
    res = con.sql(q.sql)
    return compare(spark_rows, spark_cols, res.fetchall(), res.columns)

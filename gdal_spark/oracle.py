"""DuckDB-oracle comparison used by scripts/check.py and the tests.

Mirrors the driver's correctness gate: row count + column-name set +
order-insensitive exact value compare (columns sorted by name, rows
sorted), predicting the driver's value-hash verdict.
"""

from __future__ import annotations

import math
import os

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def connect_oracle(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for tname in TABLES:
        path = f"{sf_dir}/{tname}.parquet"
        if os.path.isdir(path):
            # Spark-written table directory (e.g. the sf1 rehearsal
            # data from scripts/make_sf1.py) vs the driver's single
            # files — DuckDB needs the part-file glob for the former
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{path}')"
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


# Spark simpleString -> canonical type token; DuckDB type str -> same
# token.  The driver's value hash is type-sensitive (round 1: DuckDB
# SUM(BIGINT) -> HUGEINT hashed != Spark BIGINT despite equal values),
# so the local gate must flag any family drift, not just value drift.
_SPARK_CANON = {
    "tinyint": "i1", "smallint": "i2", "int": "i4", "bigint": "i8",
    "float": "f4", "double": "f8", "string": "s", "boolean": "b",
    "date": "d", "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bin",
}
_DUCK_CANON = {
    "TINYINT": "i1", "SMALLINT": "i2", "INTEGER": "i4", "BIGINT": "i8",
    "FLOAT": "f4", "DOUBLE": "f8", "VARCHAR": "s", "BOOLEAN": "b",
    "DATE": "d", "TIMESTAMP": "ts", "BLOB": "bin",
    # HUGEINT / unsigned / DECIMAL fall through to '!' and always flag:
    # round 1 proved the driver hash splits on them (ann_topk/lsh_ann).
}


def _canon_spark(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return f"!{dt}"
    if dt.startswith("array<"):
        return "[" + _canon_spark(dt[6:-1])
    return _SPARK_CANON.get(dt, f"!{dt}")


def _canon_duck(dt: str) -> str:
    dt = str(dt).upper()
    if dt.startswith("DECIMAL") or dt == "HUGEINT":
        return f"!{dt}"
    if dt.endswith("[]"):
        return "[" + _canon_duck(dt[:-2])
    return _DUCK_CANON.get(dt, f"!{dt}")


def compare_types(spark_cols, spark_dtypes, duck_cols, duck_types) -> list[str]:
    """Flag type-family mismatches the driver's hash would see.

    Any canonical token starting with '!' (HUGEINT, DECIMAL, unknown)
    is reported even when both sides agree on values.
    """
    problems = []
    sd = dict(zip(spark_cols, spark_dtypes))
    dd = dict(zip(duck_cols, duck_types))
    for col in sd:
        if col not in dd:
            continue
        cs, cd = _canon_spark(sd[col]), _canon_duck(dd[col])
        if cs != cd or cs.startswith("!") or cd.startswith("!"):
            problems.append(
                f"dtype {col}: spark={sd[col]}({cs}) duck={dd[col]}({cd})")
    return problems


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

    def row_key(row):
        # total order across None/str/numeric so NULL-bearing rows sort
        return tuple(
            (v is None, isinstance(v, str), v if v is not None else 0)
            for v in row)

    s = sorted((tuple(norm(r[i]) for i in order) for r in spark_rows),
               key=row_key)
    d = sorted((tuple(norm(r[i]) for i in dorder) for r in duck_rows),
               key=row_key)
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
    sql = q.resolve_sql()
    if sql is None:
        return []
    res = con.sql(sql)
    duck_cols, duck_types = res.columns, res.types
    spark_dtypes = [dt for _, dt in df.dtypes]
    return (
        compare_types(spark_cols, spark_dtypes, duck_cols, duck_types)
        + compare(spark_rows, spark_cols, res.fetchall(), duck_cols)
    )

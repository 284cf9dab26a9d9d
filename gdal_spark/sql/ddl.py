"""OGR SQL DDL subset over Spark temp views.

The reference's ``ExecuteSQL`` intercepts a handful of DDL commands
before the SELECT parser and applies them imperatively to the layer
(/root/reference/gcore/gdaldataset.cpp:6255-6818 — ProcessSQLCreateIndex,
ProcessSQLDropIndex, ProcessSQLDropTable,
ProcessSQLAlterTableAddColumn / DropColumn / RenameColumn /
AlterColumn).  Spark-first mapping:

* ``ALTER TABLE t ADD/DROP/RENAME/ALTER COLUMN`` — a DataFrame schema
  op on the registered temp view, re-registered under the same name
  (subsequent dialect statements see the new schema, like OGR's
  in-place layer mutation);
* ``DROP TABLE t`` — drop the temp view;
* ``CREATE INDEX ON t USING col`` / ``DROP INDEX ON t [USING col]`` —
  recorded NO-OPS: Spark has no secondary indexes (scans prune via
  parquet min/max + partition pruning instead, which is what an
  attribute index buys OGR).  The index registry records the request
  so tooling that creates-then-drops indexes ports cleanly.

OGR field types map per the reference's own SQLite mapping
(ogr2sqlite type affinity): INTEGER->int, INTEGER64->bigint,
FLOAT/NUMERIC/DOUBLE[PRECISION]->double, CHARACTER/VARCHAR/STRING/
TEXT(n)->string, DATE->date, TIMESTAMP/DATETIME->timestamp,
TIME->string (Spark has no time-of-day type; OGR renders it as text),
BOOLEAN->boolean.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .lexer import significant, tokenize

# (layer_lower, column_lower) -> True for every CREATE INDEX seen;
# DROP INDEX removes entries.  Purely a record (see module docstring).
ATTRIBUTE_INDEXES: dict[tuple[str, str], bool] = {}

_TYPE_MAP = {
    "integer": "int",
    "int": "int",
    "integer64": "bigint",
    "bigint": "bigint",
    "smallint": "smallint",
    "float": "double",
    "numeric": "double",
    "double": "double",
    "real": "double",
    "character": "string",
    "varchar": "string",
    "string": "string",
    "text": "string",
    "date": "date",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "time": "string",
    "boolean": "boolean",
}


class DDLError(ValueError):
    pass


def _spark_type(toks, i):
    """Parse an OGR field type at toks[i]; returns (spark_type, next_i).
    Accepts CHARACTER(20)-style width (ignored — Spark strings are
    unbounded, like OGR's width-as-hint) and DOUBLE PRECISION."""
    if i >= len(toks):
        raise DDLError("missing field type")
    name = toks[i].name.lower() if toks[i].kind != "op" else None
    if name not in _TYPE_MAP:
        raise DDLError(f"unsupported OGR field type {toks[i].text!r}")
    i += 1
    if name == "double" and i < len(toks) and toks[i].is_kw("PRECISION"):
        i += 1
    if i < len(toks) and toks[i].kind == "op" and toks[i].text == "(":
        while i < len(toks) and not (toks[i].kind == "op"
                                     and toks[i].text == ")"):
            i += 1
        i += 1
    return _TYPE_MAP[name], i


def _name(toks, i, what):
    if i >= len(toks) or toks[i].kind == "op":
        raise DDLError(f"expected {what}")
    return toks[i].name, i + 1


def _resolve(spark: SparkSession, layer: str, col: str) -> str:
    for c in spark.table(layer).columns:
        if c.lower() == col.lower():
            return c
    raise DDLError(f"no column {col!r} in layer {layer!r}")


def try_execute_ddl(spark: SparkSession, sql: str) -> bool:
    """Execute ``sql`` if it is one of the supported DDL commands.
    Returns True when handled (the statement produces no result set,
    matching the reference's NULL layer return), False when the
    statement is not DDL.  Malformed DDL raises DDLError."""
    toks = significant(tokenize(sql))
    if not toks:
        return False
    head = toks[0]

    if head.is_kw("ALTER") and len(toks) > 1 and toks[1].is_kw("TABLE"):
        layer, i = _name(toks, 2, "layer name")
        if i >= len(toks):
            raise DDLError("incomplete ALTER TABLE")
        verb = toks[i]
        i += 1
        if i < len(toks) and toks[i].is_kw("COLUMN"):
            i += 1
        df = spark.table(layer)
        if verb.is_kw("ADD"):
            col, i = _name(toks, i, "column name")
            styp, i = _spark_type(toks, i)
            out = df.withColumn(col, F.lit(None).cast(styp))
        elif verb.is_kw("DROP"):
            col, i = _name(toks, i, "column name")
            out = df.drop(_resolve(spark, layer, col))
        elif verb.is_kw("RENAME"):
            old, i = _name(toks, i, "column name")
            if i >= len(toks) or not toks[i].is_kw("TO"):
                raise DDLError("RENAME COLUMN requires TO")
            new, i = _name(toks, i + 1, "new column name")
            out = df.withColumnRenamed(_resolve(spark, layer, old), new)
        elif verb.is_kw("ALTER"):
            col, i = _name(toks, i, "column name")
            if i >= len(toks) or not toks[i].is_kw("TYPE"):
                raise DDLError("ALTER COLUMN requires TYPE")
            styp, i = _spark_type(toks, i + 1)
            col = _resolve(spark, layer, col)
            out = df.withColumn(col, F.col(col).cast(styp))
        else:
            raise DDLError(f"unsupported ALTER TABLE verb {verb.text!r}")
        if i != len(toks):
            raise DDLError(f"trailing tokens after ALTER TABLE: "
                           f"{sql[toks[i].start:]!r}")
        out.createOrReplaceTempView(layer)
        return True

    if head.is_kw("DROP") and len(toks) > 1 and toks[1].is_kw("TABLE"):
        layer, i = _name(toks, 2, "layer name")
        if i != len(toks):
            raise DDLError("trailing tokens after DROP TABLE")
        if not spark.catalog.dropTempView(layer):
            raise DDLError(f"no layer {layer!r}")
        return True

    # CREATE INDEX ON <layer> USING <column> (gdaldataset.cpp:6255)
    if (head.is_kw("CREATE") and len(toks) >= 6 and toks[1].is_kw("INDEX")
            and toks[2].is_kw("ON") and toks[4].is_kw("USING")):
        layer, col = toks[3].name, toks[5].name
        _resolve(spark, layer, col)
        ATTRIBUTE_INDEXES[(layer.lower(), col.lower())] = True
        return True

    # DROP INDEX ON <layer> [USING <column>] (gdaldataset.cpp:6317)
    if (head.is_kw("DROP") and len(toks) >= 4 and toks[1].is_kw("INDEX")
            and toks[2].is_kw("ON")):
        layer = toks[3].name.lower()
        if len(toks) >= 6 and toks[4].is_kw("USING"):
            ATTRIBUTE_INDEXES.pop((layer, toks[5].name.lower()), None)
        else:
            for k in [k for k in ATTRIBUTE_INDEXES if k[0] == layer]:
                del ATTRIBUTE_INDEXES[k]
        return True

    return False

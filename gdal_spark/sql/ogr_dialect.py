"""OGR SQL dialect shim: run OGR-dialect statements on Spark SQL.

Catalyst already speaks a superset of the OGR SQL grammar
(/root/reference/doc/source/user/ogr_sql_dialect.rst;
parser /root/reference/ogr/swq_select.cpp, grammar
/root/reference/ogr/swq_parser.y:821).  What needs translation are
the dialect's quirks:

* ``* EXCLUDE (f1, f2)``       — swq PushExcludeField
  (/root/reference/ogr/ogr_swq.h:453): rewritten to an explicit
  column list from the layer schema;
* special fields               — ``FID`` and ``OGR_GEOM_AREA``
  (/root/reference/ogr/ogr_p.h:167-174): attached as real columns at
  layer registration (area = shoelace |outer| - |holes|,
  kernels.geom.polygon_area ≡ OGRPolygon::get_Area);
* one-to-FIRST-match LEFT JOIN — OGR joins take the first matching
  secondary feature (/root/reference/ogr/ogrsf_frmts/generic/
  ogr_gensql.cpp:1497-1527): the secondary table is wrapped in a
  row_number()=1 subquery partitioned by the join key, ordered by
  FID;
* summary mode                 — aggregates without GROUP BY
  (ogr_gensql.cpp:849) collapse to one row: Spark semantics already
  match;
* ``HSTORE_GET_VALUE(h, k)``   — swq_op_general.cpp:291: rewritten
  to ``str_to_map(...)[k]``.

Everything else (WHERE trees, LIKE/ILIKE, CAST, DISTINCT, ORDER BY,
LIMIT/OFFSET, UNION ALL) passes through to Spark SQL untouched.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernels import geom as kgeom
from ..kernels import wkb as kwkb


_GEOM_TYPE_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def register_layer(spark: SparkSession, name: str, df: DataFrame,
                   fid_col: str = "fid", wkb_col: str | None = "wkb") -> None:
    """Expose a DataFrame as an OGR layer with the dialect's special
    fields (ogr/ogr_p.h:167-174): FID, OGR_GEOMETRY (type name, read
    JVM-side from the WKB header byte), OGR_GEOM_WKT, OGR_GEOM_AREA,
    OGR_STYLE (NULL — no style table in the engine, matching OGR's
    NULL for unstyled features); then registers a temp view."""
    out = df
    if fid_col in df.columns and "FID" not in df.columns:
        out = out.withColumn("FID", F.col(fid_col))
    if wkb_col and wkb_col in df.columns:

        @F.pandas_udf("double")
        def _area(wkbs: pd.Series) -> pd.Series:
            return wkbs.map(
                lambda b: kgeom.polygon_area(kwkb.polygon_rings(bytes(b)))
                if b is not None else 0.0
            )

        @F.pandas_udf("string")
        def _wkt(wkbs: pd.Series) -> pd.Series:
            from ..functions.st import _st_astext

            return _st_astext(wkbs)

        # geometry type id = byte 2 of little-endian WKB (< 256 for
        # the 2-D set) — a pure Column read, no Python
        gtype = F.conv(
            F.hex(F.substring(F.col(wkb_col), 2, 1)), 16, 10).cast("int")
        gname = None
        for tid, tname in _GEOM_TYPE_NAMES.items():
            gname = (F.when(gtype == tid, F.lit(tname)) if gname is None
                     else gname.when(gtype == tid, F.lit(tname)))
        out = (
            out.withColumn("OGR_GEOMETRY", gname)
            .withColumn("OGR_GEOM_AREA", _area(F.col(wkb_col)))
            .withColumn("OGR_GEOM_WKT", _wkt(F.col(wkb_col)))
        )
    out = out.withColumn("OGR_STYLE", F.lit(None).cast("string"))
    out.createOrReplaceTempView(name)


_EXCLUDE_RE = re.compile(
    r"\*\s+EXCLUDE\s*\(([^)]*)\)", re.IGNORECASE)
_LEFT_JOIN_RE = re.compile(
    r"LEFT\s+JOIN\s+(\w+)\s+ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)",
    re.IGNORECASE)
_HSTORE_RE = re.compile(r"HSTORE_GET_VALUE\s*\(", re.IGNORECASE)


def _rewrite_exclude(sql: str, spark: SparkSession) -> str:
    m = _EXCLUDE_RE.search(sql)
    if not m:
        return sql
    excluded = {c.strip().lower() for c in m.group(1).split(",")}
    fm = re.search(r"FROM\s+(\w+)", sql, re.IGNORECASE)
    if not fm:
        return sql
    cols = [
        c for c in spark.table(fm.group(1)).columns
        if c.lower() not in excluded
    ]
    return sql[: m.start()] + ", ".join(cols) + sql[m.end():]


def _rewrite_first_match_join(sql: str, spark: SparkSession) -> str:
    """LEFT JOIN t ON a.k = t.k2  ->  first-match subquery on t.

    'First' = lowest FID (OGR iterates the secondary in FID order,
    ogr_gensql.cpp:1497-1527); layers without FID fall back to the
    join key itself (then first == any of the equal-key rows,
    deterministic because ties are keyed)."""

    def repl(m):
        t1, a, k_a, b, k_b = m.groups()
        if b.lower() == t1.lower():
            sec, sec_key, prim, prim_key = t1, k_b, a, k_a
        elif a.lower() == t1.lower():
            sec, sec_key, prim, prim_key = t1, k_a, b, k_b
        else:
            return m.group(0)
        try:
            order = "FID" if "FID" in spark.table(sec).columns else sec_key
        except Exception:
            order = sec_key
        sub = (
            f"(SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
            f"(PARTITION BY {sec_key} ORDER BY {order}) AS __rn FROM {sec}) "
            f"WHERE __rn = 1) {sec}"
        )
        return (f"LEFT JOIN {sub} ON {prim}.{prim_key} = {sec}.{sec_key}")

    # rewrite only joins at paren depth 0: a parenthesized subquery is
    # beyond the OGR dialect (swq has no subqueries) and passes through
    # to Spark SQL with standard all-matches semantics.  Multiple
    # depth-0 LEFT JOINs (multi-secondary, ogr_sql_dialect.rst JOIN
    # section) each get their own first-match wrapper.
    def _depth(prefix: str) -> int:
        # parens inside quoted string literals don't open scopes
        d = 0
        in_str = False
        i = 0
        while i < len(prefix):
            ch = prefix[i]
            if in_str:
                if ch == "'":
                    if i + 1 < len(prefix) and prefix[i + 1] == "'":
                        i += 1          # escaped '' stays in-string
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
            i += 1
        return d

    out = []
    pos = 0
    for m in _LEFT_JOIN_RE.finditer(sql):
        if _depth(sql[:m.start()]) > 0:
            continue
        out.append(sql[pos:m.start()])
        out.append(repl(m))
        pos = m.end()
    out.append(sql[pos:])
    return "".join(out)


def _rewrite_hstore(sql: str) -> str:
    """HSTORE_GET_VALUE(h, 'k') -> str_to_map(h, ',', '=>')['k']."""
    out = []
    pos = 0
    for m in _HSTORE_RE.finditer(sql):
        start = m.end()
        depth = 1
        i = start
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner = sql[start:i - 1]
        h, k = inner.rsplit(",", 1)
        out.append(sql[pos:m.start()])
        out.append(f"str_to_map(replace({h.strip()}, ' ', ''), ',', '=>')"
                   f"[{k.strip()}]")
        pos = i
    out.append(sql[pos:])
    return "".join(out)


def ogr_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute an OGR-SQL-dialect statement against registered layers."""
    sql = _rewrite_exclude(sql, spark)
    sql = _rewrite_first_match_join(sql, spark)
    sql = _rewrite_hstore(sql)
    return spark.sql(sql)

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

* double-quoted identifiers    — the OGR dialect quotes identifiers
  with ``"`` (swq_scanner.l treats double-quoted runs as column
  references); Spark SQL reads ``"..."`` as a string literal, so
  every quoted identifier is re-spelled with backticks.

Everything else (WHERE trees, LIKE/ILIKE, CAST, DISTINCT, ORDER BY,
LIMIT/OFFSET, UNION ALL) passes through to Spark SQL untouched.

Statements are tokenized first (`lexer.tokenize`, the swq_scanner.l
role) and every rewrite walks the token stream, so string literals,
quoted identifiers, and comments are atomic: a literal containing
``LEFT JOIN`` or ``* EXCLUDE (...)`` text can never trigger a
rewrite, which was the documented failure mode of the previous
regex-based scanner.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernels import geom as kgeom
from ..kernels import wkb as kwkb
from .lexer import Token, significant, tokenize


_GEOM_TYPE_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def register_layer(spark: SparkSession, name: str, df: DataFrame,
                   fid_col: str = "fid", wkb_col: str | None = "wkb",
                   style_col: str | None = "ogr_style") -> None:
    """Expose a DataFrame as an OGR layer with the dialect's special
    fields (ogr/ogr_p.h:167-174): FID, OGR_GEOMETRY (type name, read
    JVM-side from the WKB header byte), OGR_GEOM_WKT, OGR_GEOM_AREA,
    OGR_STYLE.  OGR_STYLE mirrors OGRFeature::GetStyleString
    (ogr/ogrfeature.cpp:6985-7024): the per-feature style string when
    the layer carries one (``style_col``, e.g. ``PEN(c:#FF0000,w:2px)``
    strings ingested from a styled source), NULL otherwise — OGR
    likewise returns NULL for unstyled features.  Then registers a
    temp view."""
    out = df
    if fid_col in df.columns and "FID" not in df.columns:
        out = out.withColumn("FID", F.col(fid_col))
    if wkb_col and wkb_col in df.columns:

        @F.pandas_udf("double")
        def _area(wkbs: pd.Series) -> pd.Series:
            # batched decode (kernels/batch_measures.py): uniform
            # layouts take the zero-per-row matrix path — this column
            # is materialized for EVERY row of every registered layer
            from ..kernels import batch_measures as kbm

            return pd.Series(kbm.batch_area(wkbs), index=wkbs.index)

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
    if style_col and style_col in df.columns:
        out = out.withColumn("OGR_STYLE", F.col(style_col).cast("string"))
    else:
        out = out.withColumn("OGR_STYLE", F.lit(None).cast("string"))
    out.createOrReplaceTempView(name)


def style_tool_param_col(style, tool: str, param: str):
    """Extract one tool parameter from an OGR feature-style string —
    the OGRStyleTool::GetParamStr read path (ogr/ogr_featurestyle.cpp,
    OGRStyleMgr part split + param lookup) as pure Column regexps, so
    a styled layer can be filtered/projected on e.g. its PEN color
    JVM-side with no Python in the plan.

    ``style_tool_param_col(F.col("OGR_STYLE"), "PEN", "c")`` over
    ``PEN(c:#FF0000,w:2px);BRUSH(fc:#0000FF)`` -> ``#FF0000``; NULL
    when the tool or param is absent (OGR returns a not-found flag).
    Tools: PEN/BRUSH/SYMBOL/LABEL (ogr_featurestyle.h:77-82)."""
    style = F.col(style) if isinstance(style, str) else style
    part = F.regexp_extract(style, re.escape(tool) + r"\(([^)]*)\)", 1)
    val = F.regexp_extract(part, r"(?:^|,)" + re.escape(param)
                           + r":([^,]*)", 1)
    return F.nullif(val, F.lit(""))


_PLAIN_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")
_NAME_KINDS = ("ident", "qident", "bident")


def _emit_name(name: str) -> str:
    """Spell an identifier for Spark SQL: bare when it lexes as one,
    backtick-quoted (with `` escaping) otherwise."""
    if _PLAIN_IDENT.match(name):
        return name
    return "`" + name.replace("`", "``") + "`"


def _splice(sql: str, edits: list[tuple[int, int, str]]) -> str:
    """Apply non-overlapping [start, end) -> text edits."""
    for start, end, text in sorted(edits, reverse=True):
        sql = sql[:start] + text + sql[end:]
    return sql


def _rewrite_exclude(sql: str, spark: SparkSession) -> str:
    """``* EXCLUDE (f1, f2)`` -> explicit column list from the layer
    schema (swq PushExcludeField, /root/reference/ogr/ogr_swq.h:453)."""
    toks = significant(tokenize(sql))
    edits: list[tuple[int, int, str]] = []
    i = 0
    while i + 2 < len(toks):
        if not (toks[i].kind == "op" and toks[i].text == "*"
                and toks[i + 1].is_kw("EXCLUDE")
                and toks[i + 2].kind == "op" and toks[i + 2].text == "("):
            i += 1
            continue
        j = i + 3
        excluded: set[str] = set()
        while j < len(toks) and not (toks[j].kind == "op"
                                     and toks[j].text == ")"):
            if toks[j].kind in _NAME_KINDS:
                excluded.add(toks[j].name.lower())
            j += 1
        if j == len(toks):
            raise ValueError("unclosed EXCLUDE(...) list")
        # the dialect has no subqueries: the statement's single
        # depth-0 FROM names the layer whose schema we expand
        table = None
        depth = 0
        seen_from = False
        for t in toks[j + 1:]:
            if t.kind == "op":
                depth += t.text == "("
                depth -= t.text == ")"
            elif depth == 0 and t.is_kw("FROM"):
                seen_from = True
            elif depth == 0 and seen_from and t.kind in _NAME_KINDS:
                table = t.name
                break
        if table is None:
            i = j
            continue
        cols = [_emit_name(c) for c in spark.table(table).columns
                if c.lower() not in excluded]
        edits.append((toks[i].start, toks[j].end, ", ".join(cols)))
        i = j + 1
    return _splice(sql, edits)


def _rewrite_first_match_join(sql: str, spark: SparkSession) -> str:
    """LEFT JOIN t ON a.k = t.k2  ->  first-match subquery on t.

    'First' = lowest FID (OGR iterates the secondary in FID order,
    ogr_gensql.cpp:1497-1527); layers without FID fall back to the
    join key itself (then first == any of the equal-key rows,
    deterministic because ties are keyed).

    Only joins at paren depth 0 are rewritten: a parenthesized
    subquery is beyond the OGR dialect (swq has no subqueries) and
    passes through to Spark SQL with standard all-matches semantics.
    Multiple depth-0 LEFT JOINs (multi-secondary,
    ogr_sql_dialect.rst JOIN section) each get their own wrapper.
    Paren depth is counted over TOKENS, so parens inside string
    literals or quoted identifiers never open a scope."""
    toks = significant(tokenize(sql))
    edits: list[tuple[int, int, str]] = []
    depth = 0
    i = 0

    def name_dot_name(k: int) -> tuple[str, str] | None:
        if (k + 2 < len(toks) and toks[k].kind in _NAME_KINDS
                and toks[k + 1].kind == "op" and toks[k + 1].text == "."
                and toks[k + 2].kind in _NAME_KINDS):
            return toks[k].name, toks[k + 2].name
        return None

    while i < len(toks):
        t = toks[i]
        if t.kind == "op":
            depth += t.text == "("
            depth -= t.text == ")"
            i += 1
            continue
        if not (depth == 0 and t.is_kw("LEFT")
                and i + 3 < len(toks) and toks[i + 1].is_kw("JOIN")
                and toks[i + 2].kind in _NAME_KINDS
                and toks[i + 3].is_kw("ON")):
            i += 1
            continue
        t1 = toks[i + 2].name
        lhs = name_dot_name(i + 4)
        if lhs is None or not (i + 7 < len(toks) and toks[i + 7].kind == "op"
                               and toks[i + 7].text == "="):
            i += 1
            continue
        rhs = name_dot_name(i + 8)
        if rhs is None:
            i += 1
            continue
        (a, k_a), (b, k_b) = lhs, rhs
        if b.lower() == t1.lower():
            sec, sec_key, prim, prim_key = t1, k_b, a, k_a
        elif a.lower() == t1.lower():
            sec, sec_key, prim, prim_key = t1, k_a, b, k_b
        else:
            i += 1
            continue
        try:
            order = "FID" if "FID" in spark.table(sec).columns else sec_key
        except Exception:
            order = sec_key
        sec_q, key_q = _emit_name(sec), _emit_name(sec_key)
        sub = (
            f"(SELECT * FROM (SELECT *, ROW_NUMBER() OVER "
            f"(PARTITION BY {key_q} ORDER BY {_emit_name(order)}) AS __rn "
            f"FROM {sec_q}) WHERE __rn = 1) {sec_q}"
        )
        edits.append((
            t.start, toks[i + 10].end,
            f"LEFT JOIN {sub} ON {_emit_name(prim)}.{_emit_name(prim_key)} "
            f"= {sec_q}.{key_q}",
        ))
        i += 11
    return _splice(sql, edits)


def _rewrite_hstore(sql: str) -> str:
    """HSTORE_GET_VALUE(h, 'k') -> str_to_map(h, ',', '=>')['k']
    (swq_op_general.cpp:291).  Arguments are split at the TOP-LEVEL
    comma by token-balanced paren scan, so nested calls and literals
    containing commas or parens pass through intact."""
    toks = significant(tokenize(sql))
    edits: list[tuple[int, int, str]] = []
    i = 0
    while i + 1 < len(toks):
        if not (toks[i].is_kw("HSTORE_GET_VALUE")
                and toks[i + 1].kind == "op" and toks[i + 1].text == "("):
            i += 1
            continue
        depth = 1
        comma = None
        j = i + 2
        while j < len(toks) and depth:
            tj = toks[j]
            if tj.kind == "op":
                depth += tj.text == "("
                depth -= tj.text == ")"
                if depth == 1 and tj.text == ",":
                    comma = tj
            j += 1
        if depth or comma is None:
            raise ValueError("malformed HSTORE_GET_VALUE(...) call")
        rparen = toks[j - 1]
        h = sql[toks[i + 1].end:comma.start].strip()
        k = sql[comma.end:rparen.start].strip()
        edits.append((
            toks[i].start, rparen.end,
            f"str_to_map(replace({h}, ' ', ''), ',', '=>')[{k}]",
        ))
        i = j
    return _splice(sql, edits)


def _rewrite_quoted_idents(sql: str) -> str:
    """Re-spell OGR double-quoted identifiers as Spark backtick
    identifiers.  In the dialect ``"..."`` is always a column/table
    reference (swq_scanner.l), while Spark SQL lexes it as a string
    literal — so every surviving qident token is converted, with
    ``""`` unescaped and ``\\``` re-escaped."""
    toks = tokenize(sql)
    edits = [(t.start, t.end, _emit_name(t.name))
             for t in toks if t.kind == "qident"]
    return _splice(sql, edits)


def ogr_sql(spark: SparkSession, sql: str) -> DataFrame | None:
    """Execute an OGR-SQL-dialect statement against registered layers.

    DDL commands (ALTER TABLE ADD/DROP/RENAME/ALTER COLUMN, DROP
    TABLE, CREATE/DROP INDEX — the reference intercepts these before
    its SELECT parser, gcore/gdaldataset.cpp:6255-6818) are handled by
    sql/ddl.py and return None, matching ExecuteSQL's NULL layer for
    statements without a result set.

    SELECTs go through the recursive-descent grammar
    (sql/parser.py — the swq_parser.y select_statement, extended with
    sub-SELECT in FROM) and one tree walk applies every dialect
    rewrite in correct scope.  Statements the grammar does not cover
    fall back to the token-stream rewrites (identical behavior on the
    shared surface, pinned by tests/test_ogr_parser.py)."""
    from .ddl import try_execute_ddl
    from .parser import ParseError, emit, parse
    from .spatial_rewrite import try_spatial_join_rewrite

    if try_execute_ddl(spark, sql):
        return None
    try:
        tree = parse(sql)
    except ParseError:
        return spark.sql(_legacy_rewrites(spark, sql))
    # SURVEY §4.3 auto-rewrite: a JOIN ... ON ST_Intersects(a.g, b.g)
    # statement re-plans as the salted two-phase cell join instead of
    # Catalyst's CartesianProduct + per-pair UDF (spatial_rewrite.py)
    rewritten = try_spatial_join_rewrite(spark, tree)
    if rewritten is not None:
        return rewritten
    return spark.sql(emit(tree, spark))


def _legacy_rewrites(spark: SparkSession, sql: str) -> str:
    sql = _rewrite_exclude(sql, spark)
    sql = _rewrite_first_match_join(sql, spark)
    sql = _rewrite_hstore(sql)
    sql = _rewrite_quoted_idents(sql)
    return sql

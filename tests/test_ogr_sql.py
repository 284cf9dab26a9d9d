"""OGR SQL dialect goldens — mirrors the reference's own SQL suite
(/root/reference/autotest/ogr/ogr_sql_test.py) against the poly
fixture layer (attribute rows cloned from poly.shp's .dbf, so the
attribute goldens transfer verbatim)."""

from __future__ import annotations

import pytest

from gdal_spark.sources import fixtures as fx
from gdal_spark.sql import ogr_sql, register_layer


@pytest.fixture(scope="module")
def layers(spark):
    register_layer(spark, "poly", spark.createDataFrame(fx.polygons_pandas()))
    register_layer(spark, "idlink", spark.createDataFrame(fx.idlink_pandas()),
                   fid_col="__none__", wkb_col=None)
    return spark


def test_eas_id_less_167(layers):
    # ogr_sql_test.py:171-189: 'eas_id < 167' -> 3 features [168? no:]
    rows = ogr_sql(layers, "SELECT * FROM poly WHERE eas_id < 167").collect()
    assert len(rows) == 3
    assert sorted(r["eas_id"] for r in rows) == [158, 165, 166]


def test_distinct_ordered(layers):
    # ogr_sql_test.py:211-222 asc / :226-237 desc
    asc = ogr_sql(
        layers,
        "SELECT DISTINCT eas_id FROM poly WHERE eas_id < 170 ORDER BY eas_id",
    ).collect()
    assert [r["eas_id"] for r in asc] == [158, 165, 166, 168, 169]
    desc = ogr_sql(
        layers,
        "SELECT DISTINCT eas_id FROM poly WHERE eas_id < 170 "
        "ORDER BY eas_id DESC",
    ).collect()
    assert [r["eas_id"] for r in desc] == [169, 168, 166, 165, 158]


def test_summary_aggregates(layers):
    # ogr_sql_test.py:256+ aggregate pack on eas_id
    row = ogr_sql(
        layers,
        "SELECT MAX(eas_id) AS max_e, MIN(eas_id) AS min_e, "
        "AVG(eas_id) AS avg_e, SUM(eas_id) AS sum_e, "
        "COUNT(eas_id) AS n, COUNT(DISTINCT eas_id) AS nd FROM poly",
    ).collect()
    assert len(row) == 1
    r = row[0]
    eas = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]
    assert r["max_e"] == max(eas) and r["min_e"] == min(eas)
    assert r["sum_e"] == sum(eas) and r["n"] == 10 and r["nd"] == 10
    assert abs(r["avg_e"] - sum(eas) / 10) < 1e-9


def test_star_exclude(layers):
    df = ogr_sql(layers, "SELECT * EXCLUDE (prfedea, wkb) FROM poly")
    assert "prfedea" not in df.columns and "wkb" not in df.columns
    assert "eas_id" in df.columns


def test_special_fields(layers):
    rows = ogr_sql(
        layers,
        "SELECT FID, OGR_GEOM_AREA FROM poly ORDER BY FID",
    ).collect()
    assert [r["FID"] for r in rows] == list(range(10))
    assert all(r["OGR_GEOM_AREA"] > 0 for r in rows)


def test_first_match_left_join(layers):
    # ogr_sql_dialect.rst:411-435 join shape; idlink has one row per
    # eas_id so first-match == only-match; eas 170-173 unmatched -> NULL
    rows = ogr_sql(
        layers,
        "SELECT poly.eas_id, idlink.name FROM poly "
        "LEFT JOIN idlink ON poly.eas_id = idlink.eas_id "
        "ORDER BY poly.eas_id",
    ).collect()
    assert len(rows) == 10
    matched = {r["eas_id"]: r["name"] for r in rows if r["name"] is not None}
    assert matched == {e: f"_{e}_" for e in fx.IDLINK_EAS if e in
                       [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]}


def test_first_match_cardinality(spark, layers):
    # secondary with DUPLICATE keys: OGR returns the first (lowest FID)
    import pandas as pd

    dup = spark.createDataFrame(pd.DataFrame({
        "fid": [0, 1, 2], "k": [158, 158, 165], "v": ["a", "b", "c"],
    }))
    register_layer(spark, "dup", dup, wkb_col=None)
    rows = ogr_sql(
        layers,
        "SELECT poly.eas_id, dup.v FROM poly "
        "LEFT JOIN dup ON poly.eas_id = dup.k WHERE poly.eas_id < 166 "
        "ORDER BY poly.eas_id",
    ).collect()
    got = {r["eas_id"]: r["v"] for r in rows}
    assert got == {158: "a", 165: "c"}   # first match by FID, not 'b'


def test_substr_concat(layers):
    rows = ogr_sql(
        layers,
        "SELECT CONCAT(prfedea, '-x') AS tag, SUBSTR(prfedea, 1, 4) AS head "
        "FROM poly WHERE eas_id = 158",
    ).collect()
    assert rows[0]["tag"] == "35043369-x" and rows[0]["head"] == "3504"


def test_hstore_get_value(spark, layers):
    import pandas as pd

    register_layer(
        spark, "hst",
        spark.createDataFrame(pd.DataFrame({
            "fid": [1], "props": ['"a"=>"x", "b"=>"y"'],
        })), wkb_col=None)
    rows = ogr_sql(
        layers,
        """SELECT HSTORE_GET_VALUE(replace(props, '"', ''), 'b') AS v FROM hst""",
    ).collect()
    assert rows[0]["v"] == "y"


def test_special_fields_ogr_geometry_style_wkt(spark):
    """ogr_p.h:167-174 special fields: OGR_GEOMETRY (type name from
    the WKB header), OGR_GEOM_WKT, OGR_STYLE (NULL when unstyled)."""
    from gdal_spark.sources import fixtures as fx
    from gdal_spark.sql.ogr_dialect import ogr_sql, register_layer

    register_layer(spark, "lyr_sp", spark.createDataFrame(fx.polygons_pandas()))
    rows = ogr_sql(spark, "SELECT FID, OGR_GEOMETRY, OGR_STYLE, "
                          "OGR_GEOM_WKT FROM lyr_sp ORDER BY FID").collect()
    assert len(rows) == 10
    assert all(r["OGR_GEOMETRY"] == "POLYGON" for r in rows)
    assert all(r["OGR_STYLE"] is None for r in rows)
    assert all(r["OGR_GEOM_WKT"].startswith("POLYGON (") for r in rows)


def test_ogr_style_passthrough_and_tool_params(spark):
    """A layer with a style column surfaces it as OGR_STYLE
    (OGRFeature::GetStyleString role), and style_tool_param_col reads
    tool params JVM-side (OGRStyleTool::GetParamStr role)."""
    from pyspark.sql import functions as F

    from gdal_spark.sql.ogr_dialect import (ogr_sql, register_layer,
                                            style_tool_param_col)

    df = spark.createDataFrame(
        [(1, "PEN(c:#FF0000,w:2px);BRUSH(fc:#0000FF)"),
         (2, "LABEL(f:\"Arial\",s:12pt)"),
         (3, None)],
        "fid int, ogr_style string")
    register_layer(spark, "styled", df, wkb_col=None)
    rows = (ogr_sql(spark, "SELECT FID, OGR_STYLE FROM styled "
                           "ORDER BY FID").collect())
    assert rows[0]["OGR_STYLE"].startswith("PEN(")
    assert rows[2]["OGR_STYLE"] is None

    got = (spark.table("styled")
           .select("fid",
                   style_tool_param_col("OGR_STYLE", "PEN", "c").alias("c"),
                   style_tool_param_col("OGR_STYLE", "PEN", "w").alias("w"),
                   style_tool_param_col("OGR_STYLE", "BRUSH", "fc").alias("fc"),
                   style_tool_param_col(F.col("OGR_STYLE"), "LABEL",
                                        "s").alias("s"))
           .orderBy("fid").collect())
    assert (got[0]["c"], got[0]["w"], got[0]["fc"]) \
        == ("#FF0000", "2px", "#0000FF")
    assert got[0]["s"] is None          # tool absent -> NULL
    assert got[1]["s"] == "12pt"
    assert got[1]["c"] is None
    assert got[2]["c"] is None          # unstyled feature -> NULL

    # explicit opt-out keeps the unstyled contract
    register_layer(spark, "styled_off", df, wkb_col=None, style_col=None)
    assert all(r["OGR_STYLE"] is None
               for r in spark.table("styled_off").collect())


def test_multi_left_join_first_match(spark):
    """Two depth-0 LEFT JOINs each get the first-match wrapper."""
    from gdal_spark.sql.ogr_dialect import ogr_sql, register_layer

    base = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "fid long, k1 long, k2 long")
    s1 = spark.createDataFrame(
        [(10, "a"), (10, "b"), (20, "c")], "k1 long, v1 string")
    s2 = spark.createDataFrame(
        [(100, "x"), (200, "y"), (200, "z")], "k2 long, v2 string")
    register_layer(spark, "mbase", base, wkb_col=None)
    register_layer(spark, "ms1", s1, fid_col="nope", wkb_col=None)
    register_layer(spark, "ms2", s2, fid_col="nope", wkb_col=None)
    rows = ogr_sql(
        spark,
        "SELECT mbase.fid, ms1.v1, ms2.v2 FROM mbase "
        "LEFT JOIN ms1 ON mbase.k1 = ms1.k1 "
        "LEFT JOIN ms2 ON mbase.k2 = ms2.k2 ORDER BY mbase.fid",
    ).collect()
    # first-match: exactly one row per base feature, lowest-key row wins
    assert [(r["fid"], r["v1"], r["v2"]) for r in rows] == [
        (1, "a", "x"), (2, "c", "y")]


def test_subquery_left_join_untouched(spark):
    """A LEFT JOIN inside a parenthesized subquery is beyond the OGR
    dialect and must pass through with standard Spark semantics
    (all matches, not first-match)."""
    from gdal_spark.sql.ogr_dialect import ogr_sql, register_layer

    base = spark.createDataFrame([(1, 10)], "fid long, k1 long")
    s1 = spark.createDataFrame(
        [(10, "a"), (10, "b")], "k1 long, v1 string")
    register_layer(spark, "sbase", base, wkb_col=None)
    register_layer(spark, "ss1", s1, fid_col="nope", wkb_col=None)
    rows = ogr_sql(
        spark,
        "SELECT COUNT(*) AS n FROM "
        "(SELECT sbase.fid FROM sbase LEFT JOIN ss1 ON sbase.k1 = ss1.k1)",
    ).collect()
    assert rows[0]["n"] == 2   # all matches: the dialect rewrite stayed out


def test_left_join_inside_literal_not_rewritten(spark):
    """'LEFT JOIN ...' TEXT inside a string literal must pass through
    verbatim — the regex scanner this replaced would have rewritten
    it into a subquery mid-literal."""
    from gdal_spark.sql.ogr_dialect import ogr_sql

    trap = "x LEFT JOIN tbl ON a.k = tbl.k2 y"
    rows = ogr_sql(spark, f"SELECT '{trap}' AS v").collect()
    assert rows[0]["v"] == trap


def test_rewrite_triggers_inside_comments_ignored(spark):
    """Comments are atomic tokens: rewrite triggers inside them fire
    nothing and the statement still runs."""
    from gdal_spark.sql.ogr_dialect import ogr_sql

    rows = ogr_sql(
        spark,
        "SELECT 1 AS n -- LEFT JOIN t ON a.k = t.k\n"
        "/* * EXCLUDE (n) and HSTORE_GET_VALUE(x, 'y') */",
    ).collect()
    assert rows[0]["n"] == 1


def test_exclude_inside_literal_untouched(spark):
    from gdal_spark.sql.ogr_dialect import ogr_sql

    rows = ogr_sql(spark, "SELECT '* EXCLUDE (a, b)' AS v").collect()
    assert rows[0]["v"] == "* EXCLUDE (a, b)"


def test_double_quoted_identifiers(spark):
    """OGR quotes identifiers with double quotes
    (ogr_sql_dialect.rst: quoting field names with spaces); Spark
    would lex them as string literals, so the dialect re-spells them
    with backticks — including names containing spaces and embedded
    join keywords."""
    import pandas as pd

    from gdal_spark.sql.ogr_dialect import ogr_sql, register_layer

    df = spark.createDataFrame(pd.DataFrame({
        "fid": [1, 2],
        "the name": ["a", "b"],
        "LEFT JOIN": [10, 20],      # pathological but legal column name
    }))
    register_layer(spark, "qcols", df, wkb_col=None)
    rows = ogr_sql(
        spark,
        'SELECT "the name" AS nm, "LEFT JOIN" AS lj FROM qcols '
        'WHERE "LEFT JOIN" > 15',
    ).collect()
    assert [(r["nm"], r["lj"]) for r in rows] == [("b", 20)]


def test_hstore_second_arg_with_comma(spark):
    """The key argument may itself be a call containing commas — the
    token-balanced split must cut at the TOP-LEVEL comma only (the
    old rsplit-on-text would have split inside concat)."""
    import pandas as pd

    from gdal_spark.sql.ogr_dialect import ogr_sql, register_layer

    register_layer(
        spark, "hst2",
        spark.createDataFrame(pd.DataFrame({
            "fid": [1], "props": ["a=>x, b=>y"],
        })), wkb_col=None)
    rows = ogr_sql(
        spark,
        "SELECT HSTORE_GET_VALUE(props, concat('b', '')) AS v FROM hst2",
    ).collect()
    assert rows[0]["v"] == "y"


def test_first_match_rewrite_ignores_literal_parens(spark):
    """A '(' inside a string literal must not make the depth counter
    treat a depth-0 LEFT JOIN as a subquery join."""
    import pandas as pd

    from gdal_spark.sql.ogr_dialect import ogr_sql, register_layer

    base = spark.createDataFrame(pd.DataFrame(
        [{"fid": 1, "k": 10, "tag": "("}, {"fid": 2, "k": 20, "tag": "x"}]))
    sec = spark.createDataFrame(pd.DataFrame(
        [{"fid": i, "k2": k, "v": f"v{i}"} for i, k in
         [(1, 10), (2, 10), (3, 20)]]))
    register_layer(spark, "pbase", base, wkb_col=None)
    register_layer(spark, "psec", sec, wkb_col=None)
    rows = ogr_sql(
        spark,
        "SELECT pbase.fid, psec.v FROM pbase "
        "LEFT JOIN psec ON pbase.k = psec.k2 WHERE pbase.tag = '('"
    ).collect()
    # first-match semantics: ONE row for the matching base feature
    assert len(rows) == 1 and rows[0]["v"] == "v1"


# ---- DDL subset (gdaldataset.cpp:6255-6818) -------------------------------
class TestDDL:
    @pytest.fixture()
    def ddl_layer(self, spark):
        register_layer(spark, "ddl_poly",
                       spark.createDataFrame(fx.polygons_pandas()))
        yield spark
        spark.catalog.dropTempView("ddl_poly")

    def test_add_column_then_select(self, ddl_layer):
        assert ogr_sql(ddl_layer,
                       "ALTER TABLE ddl_poly ADD COLUMN note VARCHAR(10)"
                       ) is None
        rows = ogr_sql(ddl_layer,
                       "SELECT fid, note FROM ddl_poly").collect()
        assert all(r["note"] is None for r in rows)
        assert dict(ogr_sql(ddl_layer, "SELECT * FROM ddl_poly").dtypes
                    )["note"] == "string"

    def test_rename_column_seen_by_next_query(self, ddl_layer):
        ogr_sql(ddl_layer,
                "ALTER TABLE ddl_poly RENAME COLUMN eas_id TO eas2")
        rows = ogr_sql(ddl_layer,
                       "SELECT eas2 FROM ddl_poly WHERE eas2 < 167").collect()
        assert sorted(r["eas2"] for r in rows) == [158, 165, 166]

    def test_drop_and_alter_type(self, ddl_layer):
        ogr_sql(ddl_layer, "ALTER TABLE ddl_poly DROP COLUMN prfedea")
        cols = ogr_sql(ddl_layer, "SELECT * FROM ddl_poly").columns
        assert "prfedea" not in cols
        ogr_sql(ddl_layer,
                "ALTER TABLE ddl_poly ALTER COLUMN eas_id TYPE DOUBLE")
        assert dict(ogr_sql(ddl_layer, "SELECT * FROM ddl_poly").dtypes
                    )["eas_id"] == "double"

    def test_index_noops_recorded_and_drop_table(self, ddl_layer):
        from gdal_spark.sql.ddl import ATTRIBUTE_INDEXES
        assert ogr_sql(ddl_layer,
                       "CREATE INDEX ON ddl_poly USING eas_id") is None
        assert ATTRIBUTE_INDEXES.get(("ddl_poly", "eas_id"))
        ogr_sql(ddl_layer, "DROP INDEX ON ddl_poly USING eas_id")
        assert ("ddl_poly", "eas_id") not in ATTRIBUTE_INDEXES
        register_layer(ddl_layer, "ddl_tmp",
                       ddl_layer.createDataFrame(fx.idlink_pandas()),
                       fid_col="__none__", wkb_col=None)
        ogr_sql(ddl_layer, "DROP TABLE ddl_tmp")
        assert not ddl_layer.catalog.tableExists("ddl_tmp")

    def test_ddl_errors(self, ddl_layer):
        from gdal_spark.sql.ddl import DDLError
        with pytest.raises(DDLError, match="no column"):
            ogr_sql(ddl_layer, "ALTER TABLE ddl_poly DROP COLUMN ghost")
        with pytest.raises(DDLError, match="unsupported OGR field type"):
            ogr_sql(ddl_layer, "ALTER TABLE ddl_poly ADD COLUMN b BLOB")
        with pytest.raises(DDLError, match="TO"):
            ogr_sql(ddl_layer, "ALTER TABLE ddl_poly RENAME COLUMN fid x")

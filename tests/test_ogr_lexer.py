"""Unit tests for the OGR SQL tokenizer (`gdal_spark.sql.lexer`) and
the token-based dialect rewrites' resistance to embedded-syntax text
— the documented failure modes of the former regex scanner (a quoted
identifier or literal containing ``LEFT JOIN``, a comment containing
rewrite triggers)."""

from __future__ import annotations

import pytest

from gdal_spark.sql.lexer import SqlLexError, Token, significant, tokenize


def kinds(sql):
    return [(t.kind, t.text) for t in tokenize(sql)]


def test_basic_stream():
    assert kinds("SELECT a, b2 FROM t WHERE x <= 1.5e3") == [
        ("ident", "SELECT"), ("ident", "a"), ("op", ","), ("ident", "b2"),
        ("ident", "FROM"), ("ident", "t"), ("ident", "WHERE"),
        ("ident", "x"), ("op", "<="), ("num", "1.5e3"),
    ]


def test_string_and_qident_escapes():
    toks = tokenize("SELECT \"a\"\"b\" FROM t WHERE s = 'it''s'")
    q = [t for t in toks if t.kind == "qident"][0]
    s = [t for t in toks if t.kind == "str"][0]
    assert q.name == 'a"b'
    assert s.text == "'it''s'"


def test_bident_and_dot_are_separate():
    toks = tokenize("`my col`.x")
    assert [(t.kind, t.text) for t in toks] == [
        ("bident", "`my col`"), ("op", "."), ("ident", "x")]
    assert toks[0].name == "my col"


def test_comments_kept_but_not_significant():
    toks = tokenize("SELECT 1 -- LEFT JOIN trap\n, 2 /* EXCLUDE (x) */")
    assert [t.text for t in toks if t.kind == "comment"] == [
        "-- LEFT JOIN trap", "/* EXCLUDE (x) */"]
    assert all(t.kind != "comment" for t in significant(toks))


def test_spans_cover_source_exactly():
    sql = "SELECT 'a(b' AS x /*c*/ FROM t WHERE y <> 2"
    for t in tokenize(sql):
        assert sql[t.start:t.end] == t.text


def test_unterminated_raise():
    with pytest.raises(SqlLexError):
        tokenize("SELECT 'oops")
    with pytest.raises(SqlLexError):
        tokenize("SELECT /* oops")


def test_number_forms():
    assert [t.text for t in tokenize("1 2.5 .5 3e4 3.1E-2")] == [
        "1", "2.5", ".5", "3e4", "3.1E-2"]


def test_is_kw_case_insensitive():
    t = tokenize("left")[0]
    assert t.is_kw("LEFT") and not t.is_kw("JOIN")
    assert Token("str", "'LEFT'", 0, 6).is_kw("LEFT") is False

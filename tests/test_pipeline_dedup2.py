"""Paragraph dedup, decontamination, char-LM scoring — semantics and
distribution invariants (the operators' catalog oracles cover
value-exactness; these pin behavior on adversarial shapes)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import dedup as dd
from gdal_spark.operators import text as tx


def _paras(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, pidx long, para string")


def test_paragraph_dedup_keeps_first_occurrence(spark):
    k = dd.paragraph_dedup(_paras(spark, [
        (1, 0, "dup"), (1, 1, "uniq a"), (2, 0, "dup"), (2, 1, "dup"),
        (3, 0, "uniq b")]))
    got = {(r["doc_id"], r["pidx"]): r["keep"] for r in k.collect()}
    assert got == {(1, 0): True, (1, 1): True, (2, 0): False,
                   (2, 1): False, (3, 0): True}


def test_paragraph_dedup_within_doc_duplicates(spark):
    # a paragraph repeated INSIDE one doc keeps only the earliest pidx
    k = dd.paragraph_dedup(_paras(spark, [(5, 0, "x"), (5, 1, "x"),
                                          (5, 2, "x")]))
    got = {r["pidx"]: r["keep"] for r in k.collect()}
    assert got == {0: True, 1: False, 2: False}


def test_reassemble_preserves_span_order(spark):
    # surviving paragraphs keep their relative order (span-sequence
    # invariant), independent of physical row order
    k = dd.paragraph_dedup(_paras(spark, [
        (1, 2, "c"), (1, 0, "a"), (1, 1, "dup"), (2, 0, "dup")]))
    out = dd.reassemble_paragraphs(k, sep="|").collect()
    rows = {r["doc_id"]: r for r in out}
    # "dup"'s first occurrence is (1,1): doc 1 keeps all three spans
    # in pidx order regardless of row order; doc 2 loses its copy
    assert rows[1]["clean_text"] == "a|dup|c"
    assert rows[1]["n_paras"] == 3 and rows[1]["n_kept"] == 3
    assert rows[2]["clean_text"] == "" and rows[2]["n_kept"] == 0


def test_paragraph_dedup_repartition_invariant(spark):
    rows = [(d, p, f"p{(d * 3 + p) % 7}") for d in range(20)
            for p in range(4)]
    a = dd.paragraph_dedup(_paras(spark, rows))
    b = dd.paragraph_dedup(_paras(spark, rows).repartition(7))
    ka = sorted((r["doc_id"], r["pidx"], r["keep"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["pidx"], r["keep"]) for r in b.collect())
    assert ka == kb
    # exactly one keeper per distinct paragraph text
    assert sum(1 for _, _, k in ka if k) == 7


def test_contamination_counts(spark):
    bench = spark.createDataFrame([(0, "b c d e f")],
                                  "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"),      # grams "b c d e f" window hits twice
         (2, "z z z z z z"),        # no overlap
         (3, "b c d e f")],         # exact benchmark text
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_hits"], r["n_distinct_grams"])
           for r in dd.contamination(docs, bench, n=5).collect()}
    assert out == {1: (1, 1), 3: (1, 1)}
    # docs shorter than n produce no grams and never appear
    short = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    assert dd.contamination(short, bench, n=5).count() == 0


def test_charlm_matches_hand_computation(spark):
    train = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    model = tx.charlm_train(train)
    # train bigrams: ab, ba, ab -> c2 = {ab:2, ba:1}; c1 = {a:2, b:1}; V=2
    score = spark.createDataFrame([(7, "aba")], "doc_id long, text string")
    r = tx.charlm_score(score, model).collect()[0]
    assert r["n_bigrams"] == 2
    s_ab = math.floor(math.log((2 + 1) / (2 + 2)) * 1e6 + 0.5)
    s_ba = math.floor(math.log((1 + 1) / (1 + 2)) * 1e6 + 0.5)
    # compare pre-rounding (Spark rounds HALF_UP; Python round() is
    # banker's — they differ exactly at .5 boundaries like this one)
    assert r["avg_nll"] == pytest.approx(
        -(s_ab + s_ba) / 2 / 1e6, abs=1e-6)


def test_charlm_unknown_chars_smoothed(spark):
    train = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    model = tx.charlm_train(train)
    # "zz" never seen: p = (0+1)/(0+V) with V=1
    r = tx.charlm_score(
        spark.createDataFrame([(2, "zzz")], "doc_id long, text string"),
        model).collect()[0]
    assert r["avg_nll"] == pytest.approx(0.0, abs=1e-6)  # ln(1/1) = 0
    # gibberish scores worse than in-distribution text
    model2 = tx.charlm_train(spark.createDataFrame(
        [(1, "abcabcabc")], "doc_id long, text string"))
    both = tx.charlm_score(
        spark.createDataFrame([(1, "abcabc"), (2, "qxzv")],
                              "doc_id long, text string"), model2)
    got = {r["doc_id"]: r["avg_nll"] for r in both.collect()}
    assert got[1] < got[2]


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b@x.org or call 555-123-4567 from 10.0.0.1 and c@y.io"),
         (2, "clean text no pii"),
         (3, "ip 192.168.001.255 only")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (2, 1, 1)
    assert out[1]["redacted"] == \
        "mail <EMAIL> or call <PHONE> from <IP> and <EMAIL>"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ip"]) == (0, 0, 0)
    assert out[2]["redacted"] == "clean text no pii"
    assert out[3]["n_ip"] == 1 and "<IP>" in out[3]["redacted"]

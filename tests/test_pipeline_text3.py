"""DSIR importance weights, URL filtering, exact-substring window
dedup (training-pipeline additions round 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import text as tx


def _corpus(spark):
    # style A: "spark shuffle" talk; style B: "casino poker" talk
    rows = []
    for i in range(20):
        rows.append((i, "spark shuffle join broadcast partition spark "
                        "shuffle join"))
    for i in range(20, 40):
        rows.append((i, "casino poker bet jackpot casino poker bet"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_separate_styles(spark):
    raw = _corpus(spark)
    target = raw.filter(F.col("doc_id") < 5)      # style-A sample
    w = {r["doc_id"]: r["dsir_w"]
         for r in tx.dsir_weights(raw, target).collect()}
    a = [w[i] for i in range(20)]
    b = [w[i] for i in range(20, 40)]
    assert min(a) > max(b)
    sel = tx.dsir_select(raw, target, keep=20).collect()
    assert sorted(r["doc_id"] for r in sel) == list(range(20))
    assert [r["rank"] for r in
            sorted(sel, key=lambda r: r["doc_id"])] == list(range(1, 21))


def test_dsir_gram_count(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = tx.dsir_weights(df, df).collect()[0]
    # 3 unigrams + 2 bigrams
    assert out["n_grams"] == 5


def test_url_filter_precedence_and_patterns(spark):
    rows = [
        (1, "https://evil.example.org/page"),        # blocklist
        (2, "https://www.bigcasino.com/x?y=1"),      # gambling pattern
        (3, "http://bit.ly/abc"),                    # shortener (anchored)
        (4, "https://notbit.ly.fake.org/a"),         # NOT the shortener
        (5, "https://clean.example.org/"),           # clean
        (6, "https://adult-casino.net/"),            # adult beats gambling
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("evil.example.org",), ("adult-casino.net",)],
                               "host string")
    out = {r["doc_id"]: r for r in tx.url_filter(df, bl).collect()}
    assert out[1]["block_reason"] == "blocklist"
    assert out[2]["block_reason"] == "gambling"
    assert out[2]["host"] == "www.bigcasino.com"
    assert out[3]["block_reason"] == "shortener"
    assert out[4]["block_reason"] is None
    assert out[5]["block_reason"] is None
    # host both blocklisted AND pattern-matching: blocklist wins
    assert out[6]["block_reason"] == "blocklist"


def test_substring_dup_spans_and_stats(spark):
    shared = "x" * 25 + "y" * 25                      # 50 shared chars
    rows = [
        (1, "prefix one " + shared + " suffix aaaaaaaaaaaa"),
        (2, "prefix two " + shared + " other tail bbbbbbbb"),
        (3, "completely unrelated text that has no duplicate windows"),
        (4, "tiny"),                                  # shorter than win
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r
             for r in tx.substring_dup_stats(df).collect()}
    assert stats[1]["n_dup_windows"] >= 1
    assert stats[2]["n_dup_windows"] >= 1
    assert stats[3]["n_dup_windows"] == 0
    assert stats[4]["n_windows"] == 0 and stats[4]["dup_frac"] == 0.0
    assert 0 < stats[1]["dup_frac"] <= 1.0
    spans = tx.substring_dup_spans(df).collect()
    assert all(r["n_docs"] == 2 for r in spans)
    # identical windows occur at different offsets in docs 1 and 2
    # only where both windows fall fully inside the shared run; doc 3
    # never appears
    assert {r["doc_id"] for r in spans} == {1, 2}


def test_substring_dup_within_doc_only_not_counted(spark):
    # the SAME window repeated twice inside ONE doc is not a
    # cross-document duplicate (distinct-doc frequency >= 2)
    blk = "z" * 40
    df = spark.createDataFrame(
        [(1, blk + blk)], "doc_id long, text string")
    assert tx.substring_dup_spans(df).count() == 0


def test_winnowing_reference_and_guarantee(spark):
    import hashlib

    from gdal_spark.operators import text as tx

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "xxxx the quick brown fox sleeps zzzz"),
        (2, "completely different content here entirely"),
        (3, "ab"),   # shorter than k -> no fingerprints
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {(r["doc_id"], r["pos"], r["h"])
           for r in tx.winnow_fingerprints(df).collect()}

    # independent reference implementation (plain python, dict-based)
    k, w, pb = tx.WINNOW_K, tx.WINNOW_W, tx._WN_POSB

    def h40(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:10], 16)

    want = set()
    for did, t in texts:
        hs = [(i + 1, h40(t[i:i + k])) for i in range(len(t) - k + 1)]
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            best = min(win, key=lambda ph: (ph[1], -(ph[0])))
            want.add((did, best[0], best[1]))
    assert got == want

    # the winnowing guarantee: docs 0 and 1 share "the quick brown fox"
    # (19 chars >= w + k - 1 = 8) -> at least one shared hash
    h0 = {h for d, p, h in got if d == 0}
    h1 = {h for d, p, h in got if d == 1}
    h2 = {h for d, p, h in got if d == 2}
    assert h0 & h1
    assert not (h0 & h2)
    assert not any(d == 3 for d, p, h in got)


def test_cavnar_trenkle_self_classification(spark):
    """Profiles trained on clearly-distinct synthetic languages must
    classify held-in documents correctly, and the distance of the
    true language must beat a gibberish language."""
    from gdal_spark.operators import text as tx

    aa = [(i, "aa", "la le li lo lu " * 20) for i in range(5)]
    bb = [(i + 10, "bb", "zok zur zim zam " * 20) for i in range(5)]
    df = spark.createDataFrame(aa + bb, "doc_id long, lang string, text string")
    prof = tx.ngram_lang_profiles(df)
    pred = {r["doc_id"]: r["lang_pred"]
            for r in tx.ngram_lang_id(df, prof).collect()}
    for i, lang, _ in aa + bb:
        assert pred[i] == lang


def test_cavnar_trenkle_profile_shape(spark):
    from gdal_spark.operators import text as tx

    df = spark.createDataFrame(
        [(0, "en", "the cat sat on the mat " * 10)],
        "doc_id long, lang string, text string")
    prof = tx.ngram_lang_profiles(df, k=10).collect()
    assert len(prof) == 10
    assert sorted(r["pr"] for r in prof) == list(range(1, 11))

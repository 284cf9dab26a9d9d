"""Distributed BPE training — checked against an independent,
dictionary-based reference implementation written here in the test
(the textbook Sennrich algorithm over (word, freq) dicts), so a bug
in the Spark explode/replace machinery cannot hide.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from gdal_spark.operators import bpe

CORPUS = [
    "low lower lowest low low",
    "newer newer new news",
    "wider wide wide widest",
    "low newer wider low",
]


def _ref_word_freqs(texts):
    import re

    c = Counter()
    for t in texts:
        c.update(re.findall("[a-z]+", t.lower()))
    return dict(c)


def _ref_train(texts, k):
    """Reference BPE: tuple-of-tokens dict, no shared code with the
    operator (which works on sep-joined strings + SQL replace)."""
    vocab = {tuple(w): f for w, f in _ref_word_freqs(texts).items()}
    merges = []
    for _ in range(k):
        pc = Counter()
        for toks, f in vocab.items():
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # max count, ties -> lexicographically smallest pair (the
        # operator compares the sep-joined string; for sep = \x1f,
        # which sorts below every printable char, that equals tuple
        # ordering on (left, right))
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pc[best]))
        new = {}
        for toks, f in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks)
                        and (toks[i], toks[i + 1]) == best):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def _ref_encode(word, merges):
    toks = list(word)
    for a, b, _ in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_train_matches_reference(spark, docs):
    got = bpe.bpe_train(docs, num_merges=10)
    want = _ref_train(CORPUS, 10)
    assert got == want


def test_word_freqs(spark, docs):
    got = {r["word"]: r["freq"]
           for r in bpe.word_freqs(docs).collect()}
    assert got == _ref_word_freqs(CORPUS)


def test_encode_matches_reference(spark, docs):
    merges = bpe.bpe_train(docs, num_merges=8)
    words = ["lowest", "newer", "wideness", "zzz", "l"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    out = df.select("w", bpe.bpe_tokens_col("w", merges).alias("toks"))
    for r in out.collect():
        assert list(r["toks"]) == _ref_encode(r["w"], merges), r["w"]


def test_encode_is_jvm_only(spark, docs):
    merges = bpe.bpe_train(docs, num_merges=4)
    df = spark.createDataFrame([("lowest",)], "w string")
    out = df.select(bpe.bpe_tokens_col("w", merges).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_merge_counts_monotone_data(spark):
    # aaaa...: overlapping pairs must count per adjacency but merge
    # greedily left-to-right: 'aaaa' -> (a,a) count 3, after merge
    # 'aa'+'aa' (not 'a','aa','a').
    df = spark.createDataFrame([("aaaa",)], "text string")
    merges = bpe.bpe_train(df, num_merges=2)
    assert merges[0] == ("a", "a", 3)
    assert merges[1] == ("aa", "aa", 1)

"""BPE merges must anchor at token boundaries (ADVICE r3 medium).

Sennrich BPE merges a pair (l, r) only where l and r are WHOLE
adjacent tokens.  A substring replace on the sep-joined string also
matches where l is merely a SUFFIX of the preceding token: after
(t,h)->'th', a later (h,e) merge must NOT fuse tokens 'th'|'e' into
'the'.  Reference semantics: Sennrich et al. 2016 §3.2 (learn_bpe
merges whole symbols); the reference repo has no tokenizer — this op
is part of the LLM-pipeline battery.
"""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import bpe


@pytest.fixture(scope="module")
def corpus(spark):
    # word freqs: th x3, e x2, he x2, the x1
    #   round 1: (t,h) cnt 4  (th x3 + the x1)
    #   round 2: (h,e) cnt 2  (he x2; 'the' is th|e — must NOT count)
    return spark.createDataFrame(
        [("th th th e e he he the",)], "text string")


def test_train_boundary_counts(spark, corpus):
    merges = bpe.bpe_train(corpus, num_merges=2)
    assert merges[0] == ("t", "h", 4)
    # buggy substring replace would see h\x1fe inside 'th\x1fe' and
    # count 3; boundary-anchored counts only the two 'he' words
    assert merges[1] == ("h", "e", 2)


def test_encode_th_e_stays_split(spark, corpus):
    merges = bpe.bpe_train(corpus, num_merges=2)
    toks = bpe.bpe_tokens_col("word", merges)
    df = spark.createDataFrame([("the",), ("he",), ("teehee",)],
                               "word string")
    got = {r["word"]: r["t"] for r in
           df.select("word", toks.alias("t")).collect()}
    assert got["the"] == ["th", "e"]          # not ['the']
    assert got["he"] == ["he"]
    assert got["teehee"] == ["t", "e", "e", "he", "e"]


def test_adjacent_run_greedy(spark):
    # merge (a,a) over 'aaa' -> aa|a (greedy left-to-right, merged
    # token does not re-merge within the round)
    toks = bpe.bpe_tokens_col("word", [("a", "a", 0)])
    df = spark.createDataFrame([("aaa",), ("aaaa",)], "word string")
    got = {r["word"]: r["t"] for r in
           df.select("word", toks.alias("t")).collect()}
    assert got["aaa"] == ["aa", "a"]
    assert got["aaaa"] == ["aa", "aa"]


def test_oracle_agrees_on_boundary_case(spark, corpus):
    """The DuckDB oracle must implement the same boundary-anchored
    semantics (it previously mirrored the buggy replace)."""
    import duckdb

    from gdal_spark.queries.pipeline import _bpe_oracle

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT "
                "'th th th e e he he the' AS text")
    rows = con.execute(_bpe_oracle(2)).fetchall()
    assert rows[0][1:] == ("t", "h", 4)
    assert rows[1][1:] == ("h", "e", 2)

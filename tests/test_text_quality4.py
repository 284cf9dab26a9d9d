"""Gopher rules, hashing-trick quality classifier, vocab/OOV, and the
HLL / Count-Min sketches — semantics + distribution invariants (the
catalog oracles pin value-exactness at sf0.01; these pin behavior on
adversarial shapes and verify the md5 arithmetic against hashlib,
independent of both engines)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gdal_spark.operators import sketch as sk
from gdal_spark.operators import text as tx


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------- gopher rules

def test_gopher_flags_bullet_heavy_doc(spark):
    good = ("the cat and the dog went to the market in town and it "
            "was good")
    bullets = ". ".join("- item %d" % i for i in range(10))
    out = tx.gopher_rules(_docs(spark, [(1, good), (2, bullets)]))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["keep"]
    assert got[2]["bullet_frac"] > 0.9
    assert not got[2]["keep"]


def test_gopher_word_count_bounds(spark):
    out = tx.gopher_rules(_docs(spark, [(1, "too few words here")]))
    assert not out.collect()[0]["keep"]      # n_words = 4 < 5


def test_gopher_symbol_ratio(spark):
    txt = "the a of and to in is it ### ### more..."
    row = tx.gopher_rules(_docs(spark, [(1, txt)])).collect()[0]
    # 6 '#" chars + one '...' -> (6 + 1) / 11 words
    assert abs(row["symbol_ratio"] - 7.0 / 11.0) < 1e-6
    assert not row["keep"]


# ------------------------------------------------ quality classifier

def _py_weight(tok: str) -> int:
    """hashlib re-derivation of the md5 bucket->weight chain."""
    b = int(hashlib.md5(f"qc:{tok}".encode()).hexdigest()[:15], 16) \
        % tx.QC_BUCKETS
    return int(hashlib.md5(f"qw:{b}".encode()).hexdigest()[:15], 16) \
        % (2 * tx.QC_WEIGHT_SPAN + 1) - tx.QC_WEIGHT_SPAN


def test_quality_classifier_matches_hashlib(spark):
    text = "alpha beta gamma alpha"
    row = tx.quality_classifier(_docs(spark, [(7, text)])).collect()[0]
    toks = text.split(" ")
    expect = sum(_py_weight(t) for t in toks) + tx.QC_BIAS * len(toks)
    assert row["logit_num"] == expect
    assert row["n_tokens"] == 4
    assert row["keep"] == (expect > 0)


def test_quality_classifier_collision_shares_weight(spark):
    # two tokens in the same bucket MUST score the same weight
    # (hashing-trick semantics); find a colliding pair by search
    base = _py_weight("tok0")
    seen = {}
    for i in range(20000):
        t = f"tok{i}"
        b = int(hashlib.md5(f"qc:{t}".encode()).hexdigest()[:15], 16) \
            % tx.QC_BUCKETS
        if b in seen and seen[b] != t:
            a = seen[b]
            assert _py_weight(a) == _py_weight(t)
            break
        seen[b] = t
    else:
        raise AssertionError("no collision in 20k tokens?")
    assert isinstance(base, int)


# ------------------------------------------------------- vocab / OOV

def test_vocab_rank_and_oov(spark):
    docs = _docs(spark, [(1, "a a a b b c"), (2, "b d")])
    vocab = tx.build_vocab(docs, 2)
    got = {r["term"]: (r["token_id"], r["n"]) for r in vocab.collect()}
    assert got == {"a": (0, 3), "b": (1, 3)}     # count desc, term asc tie
    oov = {r["doc_id"]: (r["n_oov"], r["oov_rate"])
           for r in tx.oov_stats(docs, vocab).collect()}
    assert oov[1] == (1, round(1 / 6, 6))
    assert oov[2] == (1, 0.5)


def test_vocab_repartition_invariant(spark):
    docs = _docs(spark, [(i, f"w{i % 7} w{i % 3}") for i in range(50)])
    a = tx.build_vocab(docs, 5).collect()
    b = tx.build_vocab(docs.repartition(13), 5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ----------------------------------------------------------- sketches

def test_hll_registers_match_hashlib(spark):
    vals = [f"v{i}" for i in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "val string") \
        .withColumn("g", F.lit("g"))
    regs = {(r["bucket"]): r["max_rho"]
            for r in sk.hll_registers(df, "val", ["g"]).collect()}
    expect: dict[int, int] = {}
    m = 1 << sk.HLL_P
    for v in vals:
        h = int(hashlib.md5(f"hll:{v}".encode()).hexdigest()[:15], 16)
        bucket, rem = h % m, h >> sk.HLL_P
        if rem == 0:
            rho = sk.HLL_REG_BITS + 1
        else:
            rho = sk.HLL_REG_BITS - rem.bit_length() + 1
        expect[bucket] = max(expect.get(bucket, 0), rho)
    assert regs == expect


def test_hll_estimate_accuracy_and_partition_invariance(spark):
    n = 3000
    df = spark.createDataFrame(
        [(f"doc{i}",) for i in range(n)], "val string") \
        .withColumn("g", F.lit("g"))
    est = sk.hll_estimate(df, "val", ["g"]).collect()[0]["hll_estimate"]
    # 64 registers -> ~1.04/sqrt(64) = 13% standard error
    assert abs(est - n) / n < 0.4
    est2 = sk.hll_estimate(df.repartition(17), "val", ["g"]) \
        .collect()[0]["hll_estimate"]
    assert est == est2


def test_cm_overestimates_only_and_finds_heavy_hitter(spark):
    rows = [("heavy",)] * 500 + [(f"light{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "v string")
    sketch = sk.cm_sketch(df, "v")
    terms = df.distinct().select(F.col("v").alias("term"))
    est = {r["term"]: r["est"]
           for r in sk.cm_estimate(terms, sketch).collect()}
    assert est["heavy"] >= 500                  # never underestimates
    top = max(est.items(), key=lambda kv: (kv[1], kv[0]))
    assert top[0] == "heavy"
    for i in range(300):
        assert est[f"light{i}"] >= 1

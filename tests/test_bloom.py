"""Bloom filter: defining guarantees — zero false negatives, bounded
false-positive rate at the configured load, broadcast probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdal_spark.operators import sketch as sk


def test_no_false_negatives_and_fpr(spark):
    members = spark.range(0, 500).select(
        F.concat(F.lit("m"), F.col("id")).alias("v"))
    others = spark.range(0, 5000).select(
        F.concat(F.lit("x"), F.col("id")).alias("v"))
    bits = sk.bloom_bits(members, "v").persist()
    got_m = sk.bloom_contains(members, bits, "v").collect()
    assert all(r["maybe_present"] for r in got_m)          # no false negatives
    got_o = sk.bloom_contains(others, bits, "v").collect()
    fp = sum(1 for r in got_o if r["maybe_present"])
    # m=4096, k=4, n=500 -> theoretical FPR ~ (1-e^{-kn/m})^k ~ 2.3%;
    # allow generous slack
    assert fp / 5000 < 0.08
    bits.unpersist()


def test_bit_table_bounded_and_mergeable(spark):
    a = spark.range(0, 300).select(F.col("id").cast("string").alias("v"))
    b = spark.range(300, 600).select(F.col("id").cast("string").alias("v"))
    both = a.unionByName(b)
    u = (sk.bloom_bits(a, "v").unionByName(sk.bloom_bits(b, "v"))
         .distinct().orderBy("bit").collect())
    w = sk.bloom_bits(both, "v").orderBy("bit").collect()
    assert u == w                                  # set union == Bloom OR
    assert len(w) <= sk.BF_M


def test_probe_is_broadcast(spark):
    members = spark.range(0, 100).select(F.col("id").cast("string").alias("v"))
    bits = sk.bloom_bits(members, "v")
    out = sk.bloom_contains(members, bits, "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

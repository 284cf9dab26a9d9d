"""Bloom filter zero-false-negative guarantee under duplicate probe
rows (ADVICE r3 low): sum(_set)==k pooled 2k rows per duplicated
value and returned false — bool_and over per-row hits does not."""

from pyspark.sql import functions as F

from gdal_spark.operators import sketch as sk


def test_duplicate_probes_no_false_negative(spark):
    members = spark.createDataFrame([("a",), ("b",)], "v string")
    bits = sk.bloom_bits(members, "v")
    probes = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",), ("c",)], "v string")
    got = {r["v"]: r["maybe_present"]
           for r in sk.bloom_contains(probes, bits, "v").collect()}
    assert got["a"] is True      # duplicated member must stay present
    assert got["b"] is True
    # 'c' is a non-member; Bloom may report a (rare) false positive
    # but with m=4096, k=4 and 2 members it will not here
    assert got["c"] is False

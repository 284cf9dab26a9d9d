"""fan_out: explode-heavy operators must not inherit a byte-sized
scan's single partition (operators/parallelism.py)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.parallelism import fan_out
from gdal_spark.operators.text import charlm_score, charlm_train


@pytest.fixture(scope="module")
def spark():
    from gdal_spark.session import get_spark
    s = get_spark("test-fan-out", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, n=200):
    return spark.createDataFrame(
        [(f"d{i:04d}", f"alpha beta gamma {i} " * 30) for i in range(n)],
        "doc_id string, text string")


def test_fan_out_widens_narrow_input(spark):
    df = _docs(spark).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = fan_out(df)
    assert wide.rdd.getNumPartitions() \
        == spark.sparkContext.defaultParallelism


def test_fan_out_noop_on_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = _docs(spark).repartition(target + 2)
    out = fan_out(df)
    # already wider than the cluster: untouched, no extra shuffle
    assert out is df


def test_charlm_plan_fans_out_single_partition_scan(spark):
    """The regression observed at the sf1 rehearsal: a one-file corpus
    must NOT run the bigram explode + partial aggregate on one task.
    The plan must contain the round-robin exchange, and results must
    be identical with and without it (order-independent integer-scaled
    log sums)."""
    narrow = _docs(spark).coalesce(1)
    wide = _docs(spark).repartition(8)
    scored_n = charlm_score(narrow, charlm_train(narrow))
    plan = scored_n._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan
    scored_w = charlm_score(wide, charlm_train(wide))
    a = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
         for r in scored_n.collect()}
    b = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
         for r in scored_w.collect()}
    assert a == b

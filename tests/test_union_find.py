"""Both global_labels strategies (driver union-find vs distributed
pointer-jumping propagation) produce identical components."""

from __future__ import annotations

import pandas as pd

from gdal_spark.operators.polygonize import global_labels


def _case(spark):
    # chain 1-2-3-4, pair 10-11, singleton 20
    nodes = spark.createDataFrame(
        pd.DataFrame({"node": [1, 2, 3, 4, 10, 11, 20]}))
    edges = spark.createDataFrame(
        pd.DataFrame({"n_a": [1, 2, 3, 10], "n_b": [2, 3, 4, 11]}))
    return nodes, edges


def test_driver_and_distributed_agree(spark):
    nodes, edges = _case(spark)
    driver = {
        r["node"]: r["comp"]
        for r in global_labels(nodes, edges, driver_threshold=10**9).collect()
    }
    dist = {
        r["node"]: r["comp"]
        for r in global_labels(nodes, edges, driver_threshold=0).collect()
    }
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}
    assert driver == want
    assert dist == want


def test_long_chain_distributed(spark):
    # a 200-node path exercises pointer jumping's O(log) convergence
    n = 200
    nodes = spark.createDataFrame(pd.DataFrame({"node": list(range(n))}))
    edges = spark.createDataFrame(pd.DataFrame({
        "n_a": list(range(n - 1)), "n_b": list(range(1, n))}))
    dist = global_labels(nodes, edges, driver_threshold=0, max_rounds=16)
    comps = {r["comp"] for r in dist.collect()}
    assert comps == {0}

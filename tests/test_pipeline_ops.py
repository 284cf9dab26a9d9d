"""Sampling / scoring / repetition / equalization operator tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_stratified_sample_exact_k_and_stable(spark):
    from gdal_spark.operators.sampling import stratified_sample

    rows = [(i, "g%d" % (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    a = stratified_sample(df, ["grp"], 7).orderBy("doc_id").collect()
    # exact k per stratum
    cnt = pd.DataFrame([r.asDict() for r in a]).groupby("grp").size()
    assert (cnt == 7).all()
    # invariant under repartitioning (hash-deterministic, not sample())
    b = stratified_sample(df.repartition(13), ["grp"], 7) \
        .orderBy("doc_id").collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_hash_sample_stable_fraction(spark):
    from gdal_spark.operators.sampling import hash_sample

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    b = sorted(r["doc_id"] for r in
               hash_sample(df.repartition(7), 0.25).collect())
    assert a == b
    assert 0.15 < len(a) / 2000 < 0.35


def test_simhash_pairs_pigeonhole_recall(spark):
    """Identical docs have hamming 0 and MUST be found (distance <= 3
    guarantees a shared 4-bit band)."""
    from gdal_spark.operators import dedup as dd

    rows = [(1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "totally different words entirely distinct tokens")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dd.simhash_pairs(df).collect()}
    assert got.get((1, 2)) == 0


def test_equalize_matches_serial(spark):
    """Distributed LUT equalization == serial numpy transcription of
    ComputeEqualizationLUTs + EnhancerCallback."""
    from gdal_spark.operators.raster_calc import equalize_tiles

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(64, 64)).astype(np.uint8)
    ts = 32
    rows = [{"tx": tx, "ty": ty,
             "px": img[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
             .tobytes()}
            for ty in range(2) for tx in range(2)]
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    got = equalize_tiles(tiles, tile_size=ts).collect()
    out = np.zeros_like(img)
    for r in got:
        out[r["ty"] * ts:(r["ty"] + 1) * ts,
            r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
            r["px"], dtype=np.uint8).reshape(ts, ts)

    # serial twin (gdalenhance.cpp:364-460)
    h = np.bincount(img.ravel(), minlength=256).astype(np.int64)
    h[0] = 0
    h[255] = 0
    total = 0
    cum = np.zeros(256, dtype=np.int64)
    for i in range(256):
        cum[i] = total + h[i] // 2
        total += h[i]
    lut = np.clip((cum * 256) // max(total, 1), 0, 255).astype(np.uint8)
    assert np.array_equal(out, lut[img])


def test_bm25_self_consistency(spark):
    """Rarer terms outrank boilerplate at equal tf."""
    from gdal_spark.operators.text import bm25_topk

    rows = [(i, "common common rare%d common filler" % i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, k=1).collect()
    assert all(r["term"].startswith("rare") for r in top)

"""Banded sign-LSH scale properties (round-2 wrong #1: a single
4-plane bucket table left candidate enumeration at ~n^2/16).

Two claims, both measured, not asserted from theory:

* recall — every planted near-duplicate pair (cos >= 0.999) is
  recovered by the default 4-band x 16-bit configuration;
* selectivity — on non-duplicate vectors the banded candidate set is
  a small fraction of the old single-4-plane-bucket candidate set,
  i.e. candidates scale with the 65536-bucket band space, not with
  n^2/16.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import similarity as sim

DIM = 32
N = 400


@pytest.fixture(scope="module")
def corpus(spark):
    """N deterministic unit-ish vectors + a truncated near-copy of
    every 20th (planted dups at cos ~ 0.9999)."""
    rng = np.random.default_rng(12345)
    vecs = rng.normal(size=(N, DIM)).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    planted = [
        (10_000 + i, [float(np.floor(x * 100 + 0.5) / 100) for x in vecs[i]])
        for i in range(0, N, 20)
    ]
    df = spark.createDataFrame(rows + planted,
                               "vec_id bigint, embedding array<double>")
    return df, [(i, 10_000 + i) for i in range(0, N, 20)]


def test_planted_recall_full(corpus):
    df, planted = corpus
    out = sim.cosine_neardup_pairs(df, dim=DIM, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    missed = [p for p in planted if p not in got]
    assert not missed, f"banded LSH missed planted near-dups: {missed}"


def test_candidate_set_scales_with_band_width(corpus):
    df, planted = corpus
    fine = sim.candidate_pairs(df, dim=DIM, n_bands=sim.N_SIM_BANDS,
                               planes_per_band=sim.PLANES_PER_BAND).count()
    coarse = sim.candidate_pairs(df, dim=DIM, n_bands=1,
                                 planes_per_band=4).count()
    n = df.count()
    # the old 16-bucket space enumerates ~n^2/16 pairs; the banded
    # 4x65536 space must collapse that by at least an order of
    # magnitude on non-adversarial data
    assert coarse > (n * n) / 64, "fixture too small to exercise the bound"
    assert fine * 10 < coarse, (fine, coarse)
    # and still contain every planted pair
    assert fine >= len(planted)


def test_recall_at_two_widths(corpus):
    """Narrower bands (8 bits) must not lose planted pairs either —
    recall comes from the OR over bands, selectivity from band
    length; both configurations recover the planted set."""
    df, planted = corpus
    for ppb in (8, 16):
        out = sim.cosine_neardup_pairs(df, dim=DIM, threshold=0.999,
                                       n_bands=4, planes_per_band=ppb)
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        assert all(p in got for p in planted), f"ppb={ppb}"


def test_lsh_topk_contains_planted_neighbour(corpus):
    df, planted = corpus
    qs = df.filter(F.col("vec_id") < 100).filter(
        F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = sim.lsh_topk(df, qs, dim=DIM, k=3)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["qid"], set()).add(r["vec_id"])
    for a, b in planted:
        if a in by_q:
            assert b in by_q[a], (a, sorted(by_q[a]))


@pytest.fixture(scope="module")
def emb_df(spark):
    """The driver embeddings table shape (vec_id, embedding float[64])."""
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_kmeans_centroids_properties(spark, emb_df):
    """Lloyd's invariants: k centroids x dim coords, integer coords in
    data range, and objective non-increase vs the seed assignment."""
    import numpy as np
    from gdal_spark.operators import similarity as sim

    out = sim.kmeans_centroids(emb_df, 64, k=4, iters=3).toPandas()
    assert sorted(out["cid"].unique()) == [0, 1, 2, 3]
    assert (out.groupby("cid")["pos"].count() == 64).all()

    vecs = np.array([np.asarray(v) for v in
                     emb_df.orderBy("vec_id").toPandas()["embedding"]])
    sv = np.floor(vecs.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
    cents = np.zeros((4, 64), dtype=np.int64)
    for _, r in out.iterrows():
        cents[int(r["cid"]), int(r["pos"])] = r["val"]

    def obj(c):
        d = ((sv[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    assert obj(cents) <= obj(sv[:4])  # improves on the seed centroids


def test_ivf_with_kmeans_centroids(spark, emb_df):
    """IVF probe over kmeans centroids: same plan, sane recall vs
    brute force on the probed lists."""
    from pyspark.sql import functions as F
    from gdal_spark.operators import similarity as sim

    cents = sim.kmeans_centroids(emb_df, 64, k=4, iters=2)
    qs = emb_df.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    got = sim.ivf_topk(emb_df, qs, 64, k=3, nprobe=2,
                       centroids=cents).toPandas()
    assert set(got["rnk"]) == {1, 2, 3}
    # rank-1 with nprobe=2/4 lists must be the true self-match
    top1 = got[got["rnk"] == 1]
    assert (top1["vec_id"] == top1["qid"]).all()


def test_ivf_fallback_centroid_bound(spark, emb_df, monkeypatch):
    """The stride-subset fallback must bound its driver collect:
    LIMIT cap+1 then raise, never materialize n/stride vectors."""
    from pyspark.sql import functions as F
    from gdal_spark.operators import similarity as sim

    qs = emb_df.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    monkeypatch.setattr(sim, "MAX_DRIVER_CENTROIDS", 2)
    with pytest.raises(ValueError, match="centroid_stride"):
        sim.ivf_topk(emb_df, qs, 64, k=3, nprobe=1, centroid_stride=10)

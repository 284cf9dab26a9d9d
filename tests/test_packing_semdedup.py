"""Sequence packing + SemDeDup invariants (catalog oracles pin
value-exactness; these pin semantics on adversarial shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdal_spark.operators import packing as pk
from gdal_spark.operators import similarity as sim


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_conserves_tokens_and_is_contiguous(spark):
    docs = _docs(spark, [(i, " ".join(["w"] * (7 + i % 13)))
                         for i in range(40)])
    out = pk.pack_sequences(docs, seq_len=16, bucket_size=8).collect()
    total = sum(r["n_toks"] for r in out)
    assert total == sum(7 + i % 13 for i in range(40))
    # per-doc pieces tile the doc exactly, in seq order
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, pieces in by_doc.items():
        pieces.sort(key=lambda r: r["seq_id"])
        assert pieces[0]["doc_tok_start"] == 0
        assert pieces[-1]["doc_tok_end"] == 7 + i % 13
        for a, b in zip(pieces, pieces[1:]):
            assert a["doc_tok_end"] == b["doc_tok_start"]
            assert b["seq_id"] == a["seq_id"] + 1
    # every sequence except the last is exactly full
    per_seq: dict = {}
    for r in out:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_toks"]
    last = max(per_seq)
    for s, n in per_seq.items():
        assert n == 16 or s == last
    # no in-sequence overlaps: (seq_tok_start, n) ranges tile each seq
    spans: dict = {}
    for r in out:
        spans.setdefault(r["seq_id"], []).append(
            (r["seq_tok_start"], r["seq_tok_start"] + r["n_toks"]))
    for s, rs in spans.items():
        rs.sort()
        assert rs[0][0] == 0
        for a, b in zip(rs, rs[1:]):
            assert a[1] == b[0]


def test_pack_bucket_size_invariant(spark):
    docs = _docs(spark, [(i * 3, " ".join(["t"] * (1 + i % 5)))
                         for i in range(30)])     # sparse, non-dense ids
    a = pk.pack_sequences(docs, 8, bucket_size=4).collect()
    b = pk.pack_sequences(docs.repartition(7), 8, bucket_size=1000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_doc_longer_than_sequence(spark):
    docs = _docs(spark, [(1, " ".join(["x"] * 37))])
    out = sorted(pk.pack_sequences(docs, 10).collect(),
                 key=lambda r: r["seq_id"])
    assert [r["n_toks"] for r in out] == [10, 10, 10, 7]
    assert all(r["seq_tok_start"] == 0 for r in out)


def _vecs(spark, rows, dim=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_semdedup_drops_near_identical_keeps_lowest(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),    # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),        # different direction
        (4, [1.0, 0.002, 0.0, 0.0]),      # near-dup of 1 too
    ]
    out = {r["vec_id"]: r["keep"]
           for r in sim.semdedup(_vecs(spark, rows), 4, k=2).collect()}
    assert out[1] is True
    assert out[2] is False
    assert out[4] is False
    assert out[3] is True


def test_semdedup_cross_cluster_pairs_never_compared(spark):
    # two identical vectors FORCED into different clusters by
    # caller-supplied centroids are both kept (cluster-bounded join)
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])]
    cents = spark.createDataFrame(
        [(0, p, v) for p, v in enumerate([1000, 0, 0, 0])]
        + [(1, p, v) for p, v in enumerate([1000, 0, 0, 0])],
        "cid int, pos int, val long")
    # identical centroids -> both vectors land in cid 0 (tie -> asc);
    # sanity that the dup IS caught with one shared cluster
    out = {r["vec_id"]: r for r in sim.semdedup(
        _vecs(spark, rows), 4, centroids=cents).collect()}
    assert out[1]["keep"] is True and out[2]["keep"] is False
    # now separate clusters: nudge cid 1 to own vector 2's region and
    # put vector 2 there by construction
    cents2 = spark.createDataFrame(
        [(0, 0, 1000), (0, 1, 0), (0, 2, 0), (0, 3, 0),
         (1, 0, 0), (1, 1, 1000), (1, 2, 0), (1, 3, 0)],
        "cid int, pos int, val long")
    rows2 = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    out2 = {r["vec_id"]: r for r in sim.semdedup(
        _vecs(spark, rows2), 4, centroids=cents2).collect()}
    assert out2[1]["cid"] != out2[2]["cid"]
    assert out2[1]["keep"] and out2[2]["keep"]


def test_semdedup_partition_invariant(spark):
    rows = [(i, [float((i * 7) % 5), float(i % 3), 1.0, 0.5])
            for i in range(60)]
    df = _vecs(spark, rows)
    a = sorted(map(tuple, sim.semdedup(df, 4, k=3).collect()))
    b = sorted(map(tuple, sim.semdedup(df.repartition(11), 4, k=3).collect()))
    assert a == b

"""Similarity search over embedding columns (array<float>).

Three paths, as a training-data pipeline needs at 10^12 vectors:

* brute-force top-k — the exactness baseline: broadcast the (small)
  query set, score every vector with a JVM-side zip_with/aggregate
  fold, rank with row_number.  One pass over the corpus, no shuffle
  of the big side beyond the final per-query top-k.
* banded sign-LSH — the near-dup / ANN scale path: 64 deterministic
  hyperplanes grouped into 4 bands of 16 bits (OR-of-ANDs, the
  MinHash-banding construction).  Each band addresses 2^16 buckets,
  so candidate enumeration is an equi-join on (band_idx, band_value)
  whose per-bucket population shrinks ~65536x vs the corpus — NOT
  the n^2/16 of a single 4-plane bucket (round-2 scale flaw).  Recall
  for near-identical vectors stays high because a pair only needs to
  agree on ONE band: at cos >= 0.999 each plane agrees w.p.
  1 - acos(0.999)/pi ~= 0.9857, a 16-bit band w.p. 0.9857^16 ~= 0.79,
  and 4 bands give 1 - (1-0.79)^4 ~= 0.998.  Widen by adding bands
  (recall), lengthen bands (selectivity) — both parameters scale
  independently of the data.
* IVF — corpus sharded once by nearest coarse centroid, queries
  probe nprobe lists.

Signatures come from ONE Arrow-batched numpy int64 matmul per batch
(vectors x planes), not per-plane Column folds — 64 planes as nested
JVM folds would blow up codegen.  Dot products use SCALED-INTEGER
arithmetic: each component maps to ``floor(x*1000 + 0.5)`` (an
int64), so sums are exact and order-independent — the same value in
Spark, numpy, and the DuckDB oracle regardless of summation order.

Hot buckets (mass-duplicated embeddings) are salted through the same
``salted_self_pairs`` machinery as MinHash banding (dedup.py).

Reference role: GDAL has no ANN operator (its nearest-neighbour
analogue is the quadtree radius search, alg/gdalgrid.cpp:879-998);
this family exists for the 100-TB training-data brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import salted_self_pairs

SCALE = 1000.0
N_SIM_BANDS = 4
PLANES_PER_BAND = 16
N_PLANES = N_SIM_BANDS * PLANES_PER_BAND
PLANE_MOD = 1000


def scaled_col(vec: Column) -> Column:
    """array<float> -> array<long> of floor(x*1000+0.5)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * SCALE + 0.5).cast("long"))


def dot_scaled(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two scaled vectors (JVM fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def plane_coeff(i: int, j: int) -> int:
    """Deterministic pseudo-random hyperplane component in
    [-PLANE_MOD/2, PLANE_MOD/2): plane j, dimension i.

    xor-mix then multiply-mod: the round-2 linear-congruential form
    (i*A + j*B + C) % m made consecutive planes affine shifts of each
    other, so 64 planes carried far fewer than 64 independent bits
    (measured: 31k spurious band collisions on 400 random vectors vs
    23 with this mix).  All operands stay < 2^63 so int64 is exact in
    numpy and DuckDB alike.
    """
    return ((i * 73856093) ^ (j * 19349663)) % 1000003 * 2654435761 % PLANE_MOD - PLANE_MOD // 2


def plane_matrix(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    """(n_planes, dim) int64 hyperplane matrix (same mix as plane_coeff)."""
    i = np.arange(dim, dtype=np.int64)[None, :]
    j = np.arange(n_planes, dtype=np.int64)[:, None]
    h = np.bitwise_xor(i * 73856093, j * 19349663)
    return h % 1000003 * 2654435761 % PLANE_MOD - PLANE_MOD // 2


def band_values_udf(dim: int, n_bands: int = N_SIM_BANDS,
                    planes_per_band: int = PLANES_PER_BAND):
    """pandas UDF: scaled vector -> array<int> of per-band bucket ids.

    Plane j = band k * planes_per_band + bit l; band value packs bit
    l where (plane_j . v > 0).  One int64 matmul per Arrow batch —
    |dot| <= dim * 1000 * 500, far inside int64.  Integer math only,
    so numpy == DuckDB SUM bit-for-bit.
    """
    planes = plane_matrix(dim, n_bands * planes_per_band)
    weights = (1 << np.arange(planes_per_band, dtype=np.int64))

    @F.pandas_udf("array<int>")
    def _bands(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.int64) for v in vs])
        bits = (m @ planes.T) > 0                       # (n, n_planes)
        vals = bits.reshape(len(vs), n_bands, planes_per_band) @ weights
        return pd.Series(list(vals.astype(np.int32)))

    return _bands


def band_rows(df: DataFrame, dim: int, id_col: str, vec_col: str,
              n_bands: int = N_SIM_BANDS,
              planes_per_band: int = PLANES_PER_BAND,
              out_id: str = "id") -> DataFrame:
    """(id, bk, bv) band-bucket rows — ids only through the shuffle;
    vector payloads are joined back onto the (small) candidate set."""
    sv = df.select(F.col(id_col).alias(out_id),
                   scaled_col(F.col(vec_col)).alias("_sv"))
    bands = sv.withColumn(
        "_bands", band_values_udf(dim, n_bands, planes_per_band)(F.col("_sv")))
    return bands.select(
        out_id, F.posexplode("_bands").alias("bk", "bv"))


def brute_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """Exact top-k by scaled dot product; ties (dot desc, id asc).

    queries is broadcast (the small side); the corpus is scanned once.
    """
    v = vectors.select(
        F.col(id_col), scaled_col(F.col(vec_col)).alias("_sv"))
    q = queries.select(
        F.col(qid_col), scaled_col(F.col(qvec_col)).alias("_sq"))
    scored = v.crossJoin(F.broadcast(q)).withColumn(
        "dot", dot_scaled(F.col("_sq"), F.col("_sv")))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("dot").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, "rnk", id_col, "dot")
    )


TOPK_BANDS = 8
TOPK_PLANES_PER_BAND = 8


def lsh_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qvec",
             n_bands: int = TOPK_BANDS,
             planes_per_band: int = TOPK_PLANES_PER_BAND) -> DataFrame:
    """Approximate top-k: candidates share >=1 of the query's band
    buckets (banded OR-of-ANDs).  Candidate ids come from an
    equi-join on (band_idx, band_value); scoring joins the scaled
    vectors back onto the deduped candidate set.  Deterministic
    (integer plane math), so oracle-checkable.

    Defaults differ from the near-dup path on purpose: top-k search
    wants recall at moderate cosine (~0.6-0.9 neighbours), so bands
    are shorter and more numerous — 8 bands x 8 bits gives a cos-0.8
    neighbour ~0.75 collision probability vs ~0.10 under the 4x16
    near-dup configuration, while still bounding every bucket at
    ~n/256 per band.  Same 64 planes, regrouped.
    """
    vb = band_rows(vectors, dim, id_col, vec_col, n_bands,
                   planes_per_band, out_id="_vid")
    qb = band_rows(queries, dim, qid_col, qvec_col, n_bands,
                   planes_per_band, out_id="_qid")
    cand = (vb.join(F.broadcast(qb), ["bk", "bv"])
            .select(F.col("_qid").alias(qid_col), F.col("_vid").alias(id_col))
            .distinct())
    v = vectors.select(F.col(id_col), scaled_col(F.col(vec_col)).alias("_sv"))
    q = queries.select(F.col(qid_col), scaled_col(F.col(qvec_col)).alias("_sq"))
    scored = (cand.join(v, id_col).join(F.broadcast(q), qid_col)
              .withColumn("dot", dot_scaled(F.col("_sq"), F.col("_sv"))))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("dot").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, "rnk", id_col, "dot")
    )


def dist2_scaled(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 distance of two scaled vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivf_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 3,
             nprobe: int = 2, centroid_stride: int = 50,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qvec",
             centroids: DataFrame | None = None) -> DataFrame:
    """Inverted-file ANN: coarse centroids partition the corpus into
    lists; queries probe their ``nprobe`` nearest lists and rank only
    those candidates.  The IVF scale shape: the corpus shuffles once
    by centroid id, never all-pairs.

    Centroid source: pass ``centroids`` (the (cid, pos, val) output of
    kmeans_centroids — the production path) or fall back to a
    deterministic corpus subset (id % stride == 0).  Either way the
    whole path is exact integer math (scaled vectors, L2 via
    sum-of-squared-diffs) and oracle-checkable; the probe plan is
    identical.  Ties break (dist2 asc, cid asc) / (dot desc, id asc).
    """
    v = vectors.select(F.col(id_col), scaled_col(F.col(vec_col)).alias("_sv"))
    if centroids is not None:
        cents = (centroids.groupBy("cid")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "val")))
                      .alias("_pv"))
                 .select(F.col("cid").cast("long").alias("cid"),
                         F.transform("_pv", lambda s: s.getField("val"))
                         .alias("_cv")))
    else:
        cents = v.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).alias("cid"), F.col("_sv").alias("_cv"))

    def assign(df, key, vec, n):
        d = df.crossJoin(F.broadcast(cents)).withColumn(
            "_d2", dist2_scaled(F.col(vec), F.col("_cv")))
        w = Window.partitionBy(key).orderBy(
            F.col("_d2").asc(), F.col("cid").asc())
        return (d.withColumn("_cr", F.row_number().over(w))
                .filter(F.col("_cr") <= n).drop("_cv", "_d2", "_cr"))

    corpus = assign(v, id_col, "_sv", 1)
    q = queries.select(F.col(qid_col), scaled_col(F.col(qvec_col)).alias("_sq"))
    probes = assign(q, qid_col, "_sq", nprobe)

    scored = corpus.join(F.broadcast(probes), "cid").withColumn(
        "dot", dot_scaled(F.col("_sq"), F.col("_sv")))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("dot").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, "rnk", id_col, "cid", "dot")
    )


def candidate_pairs(vectors: DataFrame, dim: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_bands: int = N_SIM_BANDS,
                    planes_per_band: int = PLANES_PER_BAND) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs sharing >=1 band bucket.

    The pre-exact-phase candidate set — exposed separately so tests
    and PLANS.md can measure |candidates| directly against the
    n^2/buckets bound at different band widths.
    """
    bands = band_rows(vectors, dim, id_col, vec_col, n_bands,
                      planes_per_band)
    return (salted_self_pairs(bands, ["bk", "bv"], "id")
            .select("id_a", "id_b").distinct())


def cosine_neardup_pairs(vectors: DataFrame, dim: int,
                         threshold: float = 0.99,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_bands: int = N_SIM_BANDS,
                         planes_per_band: int = PLANES_PER_BAND) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.

    Banded sign-LSH prefilter (see module docstring): candidates come
    from a SALTED self-equi-join on (band_idx, 16-bit band value) —
    the corpus shuffles once per band table, per-bucket population is
    ~n/65536 per band, and hot buckets (mass-duplicate embeddings)
    spread over up to 16 salted tasks.  A pair that disagrees in all
    4 bands is missed by design (LSH recall ~0.998 at cos 0.999),
    identically in the DuckDB oracle.

    Exact phase on the deduped candidate set only: cos = dot /
    sqrt(na*nb) with integer dot/norms — one sqrt+divide, identical
    across engines.  Returns (id_a, id_b, cos) rounded to 6 places.
    """
    cand = candidate_pairs(vectors, dim, id_col, vec_col,
                           n_bands, planes_per_band)
    sv = vectors.select(F.col(id_col), scaled_col(F.col(vec_col)).alias("_sv"))
    sv = sv.withColumn("norm2", dot_scaled(F.col("_sv"), F.col("_sv")))
    a = sv.select(F.col(id_col).alias("id_a"), F.col("_sv").alias("va"),
                  F.col("norm2").alias("na"))
    b = sv.select(F.col(id_col).alias("id_b"), F.col("_sv").alias("vb"),
                  F.col("norm2").alias("nb"))
    pairs = cand.join(a, "id_a").join(b, "id_b")
    cos = F.round(
        dot_scaled(F.col("va"), F.col("vb")).cast("double")
        / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
        6,
    )
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") > threshold)
        .select("id_a", "id_b", "cos")
    )


def kmeans_centroids(vectors: DataFrame, dim: int, k: int = 8,
                     iters: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic distributed Lloyd's k-means on scaled integer
    vectors — the production centroid source for ivf_topk (replacing
    the id-stride placeholder; the IVF plan itself is unchanged).

    Scale shape per iteration:
      * assignment is PURE Column math — centroids are a broadcast
        literal (k x dim ints, driver-held), per-centroid exact int64
        L2 via zip_with folds, argmin via least() over (d2, cid)
        structs: whole-stage codegen, zero shuffle, one corpus scan;
      * the update is posexplode -> groupBy (cid, pos) sum/count —
        map-side partials, k*dim result rows collected to the driver.
    No n x k shuffle anywhere; driver state is k*dim ints.

    Determinism / oracle-exactness: init = the k lowest-id vectors;
    ties (d2 asc, cid asc); new coordinate = floor(sum/count) (exact:
    |sum| < 2^53); an emptied cluster keeps its previous centroid.
    Returns (cid, pos, val) rows, 0-based pos.
    """
    sv = vectors.select(F.col(id_col).alias("_id"),
                        scaled_col(F.col(vec_col)).alias("_sv"))
    seed = sv.orderBy("_id").limit(k).collect()
    cents = [list(r["_sv"]) for r in seed]

    for _ in range(iters):
        structs = []
        for cid, cv in enumerate(cents):
            lit = F.array(*[F.lit(int(x)).cast("long") for x in cv])
            d2 = F.aggregate(
                F.zip_with(F.col("_sv"), lit, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"), lambda acc, v: acc + v)
            structs.append(F.struct(d2.alias("d2"),
                                    F.lit(cid).cast("int").alias("cid")))
        assigned = sv.withColumn("_cid", F.least(*structs).getField("cid"))
        sums = (assigned.select("_cid", F.posexplode("_sv").alias("pos", "v"))
                .groupBy("_cid", "pos")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect())
        new = [list(c) for c in cents]  # empty cluster keeps centroid
        acc: dict = {}
        for r in sums:
            acc.setdefault(r["_cid"], {})[r["pos"]] = (r["s"], r["n"])
        import math
        for cid, d in acc.items():
            for pos, (s, n) in d.items():
                new[cid][pos] = int(math.floor(s / n))
        cents = new

    spark = vectors.sparkSession
    rows = [(cid, pos, int(v)) for cid, cv in enumerate(cents)
            for pos, v in enumerate(cv)]
    return spark.createDataFrame(rows, "cid int, pos int, val long")


def _centroid_arrays(centroids: DataFrame) -> DataFrame:
    """(cid, pos, val) rows -> (cid, _cv array<long>)."""
    return (centroids.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val")))
                 .alias("_pv"))
            .select(F.col("cid").cast("long").alias("cid"),
                    F.transform("_pv", lambda s: s.getField("val"))
                    .alias("_cv")))


def semdedup(vectors: DataFrame, dim: int, k: int = 4, iters: int = 2,
             tau: float = 0.96, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): k-means
    the embedding space, then deduplicate ONLY within each cluster —
    the cluster equi-join bounds the pair blowup to
    sum(cluster_size^2) instead of n^2, and the cluster shuffle is
    the single wide stage over the corpus.

    Determinism / oracle-exactness: centroids come from the exact
    integer Lloyd's (kmeans_centroids) or a caller-supplied table;
    assignment is the same broadcast argmin as ivf_topk (ties d2 asc,
    cid asc); a vector is dropped iff a LOWER-id vector in its
    cluster has cos >= tau.  The threshold compares
    ``dot^2 * TD >= TN * na * nb  (and dot > 0)`` where tau^2 =
    TN/TD exactly — integer-derived doubles, bit-identical in any
    IEEE engine, no sqrt.

    Returns (id, cid, keep) for every input vector.
    """
    if centroids is None:
        centroids = kmeans_centroids(vectors, dim, k=k, iters=iters,
                                     id_col=id_col, vec_col=vec_col)
    cents = _centroid_arrays(centroids)

    sv = vectors.select(F.col(id_col),
                        scaled_col(F.col(vec_col)).alias("_sv"))
    sv = sv.withColumn("_n2", dot_scaled(F.col("_sv"), F.col("_sv")))
    d = sv.crossJoin(F.broadcast(cents)).withColumn(
        "_d2", dist2_scaled(F.col("_sv"), F.col("_cv")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("_d2").asc(), F.col("cid").asc())
    assigned = (d.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .select(id_col, "cid", "_sv", "_n2"))

    tau_n = int(round(tau * 1000)) ** 2          # TN = (1000*tau)^2
    tau_d = 1000 ** 2
    a = assigned.select(F.col(id_col).alias("id_a"), F.col("cid"),
                        F.col("_sv").alias("_va"), F.col("_n2").alias("_na"))
    b = assigned.select(F.col(id_col).alias("id_b"), F.col("cid"),
                        F.col("_sv").alias("_vb"), F.col("_n2").alias("_nb"))
    dot = dot_scaled(F.col("_va"), F.col("_vb"))
    dup = (a.join(b, "cid")
           .filter(F.col("id_a") < F.col("id_b"))
           .withColumn("_dot", dot)
           .filter((F.col("_dot") > 0)
                   & (F.col("_dot").cast("double") * F.col("_dot")
                      * tau_d
                      >= F.lit(float(tau_n)) * F.col("_na") * F.col("_nb")))
           .select(F.col("id_b").alias(id_col)).distinct()
           .withColumn("_dup", F.lit(True)))
    return (assigned.join(dup, id_col, "left")
            .select(id_col, F.col("cid").cast("long").alias("cid"),
                    F.col("_dup").isNull().alias("keep")))

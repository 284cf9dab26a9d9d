"""Similarity search over embedding columns (array<float>).

Two paths, as a training-data pipeline needs at 10^12 vectors:

* brute-force top-k — the exactness baseline: broadcast the (small)
  query set, score every vector with a JVM-side zip_with/aggregate
  fold, rank with row_number.  One pass over the corpus, no shuffle
  of the big side beyond the final per-query top-k.
* LSH-bucketed (IVF-role) — the scale path: vectors land in sign-
  bucket(s) from fixed random-ish hyperplanes; candidates come from
  an equi-join on the bucket id, so the corpus is scanned once and
  shuffled by bucket, never all-pairs.

Dot products use SCALED-INTEGER arithmetic: each component maps to
``floor(x*1000 + 0.5)`` (an int64), so sums are exact and
order-independent — the same value in Spark, numpy, and the DuckDB
oracle regardless of summation order.  (Float dot products differ in
the last ulp across engines/summation orders; integers don't.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

SCALE = 1000.0
N_PLANES = 4
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
    [-PLANE_MOD/2, PLANE_MOD/2): plane j, dimension i."""
    return ((i * 2654435761 + j * 40503 + 12345) % PLANE_MOD) - PLANE_MOD // 2


def plane_arrays(dim: int) -> list[list[int]]:
    return [[plane_coeff(i, j) for i in range(dim)] for j in range(N_PLANES)]


def lsh_bucket_col(vec_scaled: Column, dim: int) -> Column:
    """Sign-bucket id in [0, 2^N_PLANES): bit j = (plane_j . v > 0)."""
    bucket = F.lit(0)
    for j, coeffs in enumerate(plane_arrays(dim)):
        plane = F.array(*[F.lit(c).cast("long") for c in coeffs])
        d = dot_scaled(vec_scaled, plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


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


def lsh_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket.

    Equi-join on bucket id — the IVF-style scale path.  Deterministic
    (bucket assignment is exact integer math), so oracle-checkable.
    """
    v = vectors.select(F.col(id_col), scaled_col(F.col(vec_col)).alias("_sv"))
    v = v.withColumn("bucket", lsh_bucket_col(F.col("_sv"), dim))
    q = queries.select(F.col(qid_col), scaled_col(F.col(qvec_col)).alias("_sq"))
    q = q.withColumn("bucket", lsh_bucket_col(F.col("_sq"), dim))
    scored = v.join(F.broadcast(q), "bucket").withColumn(
        "dot", dot_scaled(F.col("_sq"), F.col("_sv")))
    w = Window.partitionBy(qid_col).orderBy(
        F.col("dot").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, "rnk", id_col, "bucket", "dot")
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
             qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """Inverted-file ANN: coarse centroids partition the corpus into
    lists; queries probe their ``nprobe`` nearest lists and rank only
    those candidates.  The IVF scale shape: the corpus shuffles once
    by centroid id, never all-pairs.

    Centroids are a deterministic corpus subset (id % stride == 0) so
    the whole path is exact integer math (scaled vectors, L2 via
    sum-of-squared-diffs) and oracle-checkable; a production build
    would drop in k-means centroids without changing the plan.
    Ties break (dist2 asc, cid asc) / (dot desc, id asc).
    """
    v = vectors.select(F.col(id_col), scaled_col(F.col(vec_col)).alias("_sv"))
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


def cosine_neardup_pairs(vectors: DataFrame, dim: int,
                         threshold: float = 0.99,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.

    Sign-bucket prefilter: near-identical vectors share the bucket of
    ``lsh_bucket_col`` (same deterministic hyperplanes as lsh_topk),
    so candidates come from a self-EQUI-join on the bucket id — the
    corpus is shuffled once by bucket, never compared all-pairs.
    A pair whose tiny perturbation flips a plane sign is missed by
    design (LSH recall), identically in the DuckDB oracle.

    Exact phase on candidates only: cos = dot / sqrt(na*nb) with
    integer dot/norms — one sqrt+divide, identical across engines.
    Returns (id_a, id_b, cos) rounded to 6 places.
    """
    sv = vectors.select(F.col(id_col), scaled_col(F.col(vec_col)).alias("_sv"))
    sv = sv.withColumn("bucket", lsh_bucket_col(F.col("_sv"), dim))
    sv = sv.withColumn("norm2", dot_scaled(F.col("_sv"), F.col("_sv")))
    a = sv.select(F.col(id_col).alias("id_a"), F.col("bucket"),
                  F.col("_sv").alias("va"), F.col("norm2").alias("na"))
    b = sv.select(F.col(id_col).alias("id_b"), F.col("bucket"),
                  F.col("_sv").alias("vb"), F.col("norm2").alias("nb"))
    pairs = a.join(b, "bucket", "inner").filter(F.col("id_a") < F.col("id_b"))
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

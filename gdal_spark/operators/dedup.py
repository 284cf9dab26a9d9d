"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the dedup family of a web-scale training-data pipeline.

Design for 10^12 docs:

* exact dedup is a hash-groupBy — one shuffle on the digest, partial
  counts map-side;
* MinHash banding turns near-dup search into an equi-join on
  (band_index, band_value) — never an all-pairs comparison; hot
  bands (boilerplate) can be salted exactly like hot cells in the
  spatial join;
* SimHash is an explode + 16 conditional sums — shuffle carries one
  row per (doc, token), combined map-side;
* exact Jaccard runs only on band-join candidates.

Everything is Column-expression hashing (md5 / substring folds), so
both the Spark plan and the DuckDB oracle compute bit-identical
signatures.
"""

from __future__ import annotations

from .parallelism import fan_out
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .text import tokens_col

N_MINHASH = 8
N_BANDS = 4          # 2 minhashes per band
SHINGLE = 3
SIMHASH_BITS = 60   # Manku et al. (WWW'07) use 64-bit f, hamming <= 3;
                    # 60 keeps the md5-derived token hash in one signed long
SIMHASH_BAND_BITS = 15
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by content digest: (text_md5, n_copies,
    min_id) for groups with >1 member.  One shuffle, map-side
    partial aggregation."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("min_id"))
        .filter(F.col("n_copies") > 1)
    )


def shingles_col(text):
    """3-token shingles as strings (positions JVM-side via sequence)."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (SHINGLE - 1))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1),
            F.element_at(toks, i + 2)
        ),
    )


def minhash_signature(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature: minhash_i = min(md5(shingle||'#'||i))
    over the doc's 3-token shingles (string min == hash min; md5 is
    identical across engines).  Returns (id, m0..m7, band0..band3)."""
    sh = fan_out(df).select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col))).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"m{i}")
        for i in range(N_MINHASH)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    for b in range(N_BANDS):
        sig = sig.withColumn(
            f"band{b}", F.md5(F.concat(F.col(f"m{2*b}"), F.col(f"m{2*b+1}")))
        )
    return sig


HOT_BAND_ROWS = 64     # bucket size above which the self-join is salted
MAX_BAND_SALT = 16


def salted_self_pairs(rows: DataFrame, key_cols: list[str],
                      id_col: str = "id",
                      hot_threshold: int = HOT_BAND_ROWS,
                      max_salt: int = MAX_BAND_SALT) -> DataFrame:
    """All unordered same-key row pairs from a SALTED self equi-join.

    The generic LSH-bucket pair enumerator shared by MinHash banding
    and the embedding sign-bucket near-dup path.  Hot buckets
    (boilerplate text, mass-duplicated embeddings) would make one
    shuffle bucket quadratic; a per-key window count picks a salt
    factor r, the left side scatters by hash(id)%r and the right side
    replicates r ways, so a hot bucket's pair work spreads over r
    tasks while every unordered pair is still produced exactly once
    (the id< filter survives for exactly one salt value).  Output is
    bit-identical to the unsalted join — tests assert it.

    The window count shuffles `rows` by key ONCE and Catalyst reuses
    that exchange for both join sides (ReusedExchange in the plan), so
    the upstream lineage (shingle→minhash, embedding→signature) runs a
    single time with NO persist and no cache-lifecycle bookkeeping
    (round-2 wrong #3: a module-global persist registry).

    Non-key, non-id payload columns are carried through with _a/_b
    suffixes.  Returns one row per (pair, shared key value):
    (id_a, id_b, *key_cols, *payload_a, *payload_b).
    """
    payload = [c for c in rows.columns if c not in key_cols and c != id_col]
    w = Window.partitionBy(*key_cols)
    salted = rows.withColumn(
        "_r",
        F.greatest(
            F.lit(1),
            F.least(F.lit(max_salt),
                    F.ceil(F.count("*").over(w) / F.lit(hot_threshold))
                    .cast("int")),
        ),
    )
    left = salted.withColumn(
        "_s", F.pmod(F.xxhash64(id_col), F.col("_r")).cast("int")).drop("_r")
    right = salted.withColumn(
        "_s", F.explode(F.sequence(F.lit(0), F.col("_r") - 1))).withColumn(
        "_s", F.col("_s").cast("int")).drop("_r")
    for c in payload + [id_col]:
        left = left.withColumnRenamed(c, "id_a" if c == id_col else c + "_a")
        right = right.withColumnRenamed(c, "id_b" if c == id_col else c + "_b")
    return (
        left.join(right, key_cols + ["_s"], "inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("_s")
    )


def minhash_band_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       hot_threshold: int = HOT_BAND_ROWS) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band.

    Pairs come from an equi-join on (band_idx, band_value) — the
    scale path: no all-pairs work, shuffle keyed by band value, hot
    bands salted (see salted_self_pairs).

    Returns (id_a, id_b, shared_bands) with id_a < id_b.
    """
    sig = minhash_signature(df, text_col, id_col)
    bands = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("bi"), F.col(f"band{b}").alias("bv"))
                for b in range(N_BANDS)
            ])
        ).alias("b"),
    ).select("id", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    return (
        salted_self_pairs(bands, ["bi", "bv"], "id",
                          hot_threshold=hot_threshold)
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("bi").alias("shared_bands"))
    )


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash: per token, a 60-bit md5-derived integer; bit j
    contributes +1/-1; fingerprint sets bit j where the sum is > 0.

    Explode + conditional sums: one shuffle keyed by id, partial
    aggregation map-side.
    """
    tok = fan_out(df).select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    tok = tok.withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    fp = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", min_shared_bands: int = 1,
                  shingles: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard on MinHash-band candidates only.

    |A ∩ B| via join of the two docs' distinct shingle sets;
    |A ∪ B| = |A| + |B| - |A ∩ B|.  Returns (id_a, id_b, jaccard).

    ``shingles``: optional pre-built (id, shingle) DISTINCT table.
    The plan references the shingle set three times (sizes + both
    join sides); a caller that persists it (lifecycle caller-owned,
    as neardup_clusters does) avoids re-shingling the corpus 3x.
    """
    cand = minhash_band_pairs(df, text_col, id_col).filter(
        F.col("shared_bands") >= min_shared_bands
    )
    sh = shingles if shingles is not None else fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(F.col(text_col))).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cand.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def neardup_clusters(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     threshold: float = 0.5) -> DataFrame:
    """Near-duplicate clusters + canonical-document selection — the
    step a training pipeline runs after candidate generation: verified
    pairs (exact n-gram Jaccard >= threshold on MinHash-band
    candidates) become edges, connected components become clusters,
    and the lowest doc_id per cluster is kept.

    Scale shape: edges come from the salted band join (never
    all-pairs); components reuse the polygonize CC machinery —
    driver union-find below 2M edges, distributed min-propagation
    with pointer jumping (O(log diameter) rounds) above.  Returns
    (doc_id, cluster, keep) for every input doc; singletons are their
    own cluster with keep = true.
    """
    from .polygonize import global_labels

    # call-scoped persists (no module state): the shingle table is
    # referenced 3x inside jaccard_pairs, and global_labels drives
    # TWO actions over the edges (count for strategy choice, then
    # collect / min-propagation) — without these the whole candidate
    # + verify pipeline re-executes per action (measured 18.1s ->
    # ~6s at sf0.1).  Both caches are released before returning:
    # global_labels materializes comp (driver rows or an eager
    # localCheckpoint) during the call.
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(F.col(text_col))).alias("shingle"),
    ).distinct().persist()
    pairs = jaccard_pairs(df, text_col, id_col, shingles=sh).filter(
        F.col("jaccard") >= threshold)
    edges = pairs.select(F.col("id_a").alias("n_a"),
                         F.col("id_b").alias("n_b")).persist()
    nodes = df.select(F.col(id_col).alias("node")).distinct()
    try:
        comp = global_labels(nodes, edges)
    finally:
        edges.unpersist()
        sh.unpersist()
    return (df.select(id_col).distinct()
            .join(comp, F.col(id_col) == F.col("node"))
            .select(F.col(id_col),
                    F.col("comp").alias("cluster"),
                    (F.col(id_col) == F.col("comp")).alias("keep")))


SIMHASH_BANDS = 4  # 60 bits -> 4 bands of 15


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: banded hamming candidate join + exact
    popcount verify.

    The 60-bit fingerprint splits into 4 bands of 15 bits (the
    Manku et al. WWW'07 web-dedup configuration, modulo 64->60 to
    stay in one signed long); by
    pigeonhole any pair within hamming distance 3 agrees on >= 1
    band, so the band equi-join (salted, like MinHash banding) has
    EXACT recall at the default threshold while enumerating only
    same-band candidates — never all pairs.  Verification is one
    bit_count(xor) per candidate, JVM-side.
    Returns (id_a, id_b, hamming).

    Band width is the scale lever: 15-bit bands give 32768 buckets
    per band, so random-collision candidates grow ~ 4 * n^2 / 2^15
    instead of the 4 * n^2 / 2^4 a 4-bit banding produces — the
    difference between near-linear and frankly quadratic growth at
    10x data (observed 140x suite time at sf1 before widening).
    """
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        F.col(id_col).alias("id"), "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("bi"))
    bands = bands.withColumn(
        "bv", F.expr(f"shiftright(simhash, bi * {SIMHASH_BAND_BITS})"
                     f" & {SIMHASH_BAND_MASK}"))
    cand = (salted_self_pairs(bands.select("id", "bi", "bv", "simhash"),
                              ["bi", "bv"], "id")
            .select("id_a", "id_b", "simhash_a", "simhash_b").distinct())
    ham = F.bit_count(
        F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    return (cand.withColumn("hamming", ham.cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming").distinct())


def paragraph_dedup(paras: DataFrame, id_col: str = "doc_id",
                    idx_col: str = "pidx",
                    para_col: str = "para") -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (the C4 "any
    three-sentence span occurring more than once is removed keeping
    one" / CCNet paragraph-hash rule applied at paragraph grain):
    every paragraph keeps exactly its FIRST occurrence by
    (doc_id, pidx) and drops every other copy anywhere in the corpus.

    Input: exploded (id, pidx, para) rows.  Output: the same rows
    plus a boolean ``keep``.

    Design for 10^12 docs: the canonical owner per paragraph digest
    is a groupBy MIN of the packed (doc_id, pidx) struct — map-side
    partial aggregation makes boilerplate paragraphs (the skew case:
    a cookie banner appearing in 10^9 docs) collapse to one row per
    partition before the shuffle, so no window-function sort over a
    hot key.  The join back is digest-equi (AQE handles any residual
    skew); no all-pairs work anywhere.
    """
    rows = paras.select(
        F.col(id_col), F.col(idx_col), F.col(para_col),
        F.md5(F.col(para_col)).alias("_dig"))
    owner = rows.groupBy("_dig").agg(
        F.min(F.struct(F.col(id_col), F.col(idx_col))).alias("_own"))
    return (rows.join(owner, "_dig")
            .select(id_col, idx_col, para_col,
                    ((F.col("_own")[id_col] == F.col(id_col))
                     & (F.col("_own")[idx_col] == F.col(idx_col)))
                    .alias("keep")))


def reassemble_paragraphs(kept: DataFrame, id_col: str = "doc_id",
                          idx_col: str = "pidx",
                          para_col: str = "para",
                          sep: str = "\n") -> DataFrame:
    """Rebuild (id, clean_text, n_paras, n_kept) from paragraph_dedup
    output, preserving original paragraph order — the span-sequence
    invariant: surviving paragraphs keep their relative order."""
    return (kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(idx_col),
                    F.when(F.col("keep"), F.col(para_col))
                    .alias(para_col)))),
                lambda s: s[para_col]),
            sep).alias("clean_text"),
        F.count("*").alias("n_paras"),
        F.sum(F.col("keep").cast("long")).alias("n_kept")))


def contamination(docs: DataFrame, bench: DataFrame, n: int = 13,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination scan (the GPT-3/Llama n-gram overlap
    rule: a training document is contaminated if it shares any
    n-gram with an evaluation set; 13-grams in the published
    recipes).  Returns per-doc (doc_id, n_hits, n_distinct_grams)
    for contaminated docs only.

    Design for 10^12 docs: the benchmark side is small by definition
    (eval suites), so its distinct n-gram digests BROADCAST; the
    corpus side explodes n-grams JVM-side and probes the broadcast
    hash table — zero shuffle on the corpus until the final per-doc
    count (map-side combined).  Digests are md5 strings so the
    DuckDB oracle reproduces them bit-for-bit.
    """
    def grams(df):
        base = df.select(F.col(id_col),
                         tokens_col(F.col(text_col)).alias("_toks")) \
            .filter(F.size("_toks") >= n)
        idx = F.sequence(F.lit(1), F.size("_toks") - (n - 1))
        g = F.transform(
            idx,
            lambda i: F.array_join(F.slice("_toks", i, n), " "))
        return base.select(F.col(id_col),
                           F.explode(g).alias("_gram")) \
            .select(id_col, F.md5("_gram").alias("_dig"))

    bench_grams = grams(bench).select("_dig").distinct()
    hits = grams(fan_out(docs)).join(F.broadcast(bench_grams), "_dig")
    return (hits.groupBy(id_col)
            .agg(F.count("*").alias("n_hits"),
                 F.countDistinct("_dig").alias("n_distinct_grams")))

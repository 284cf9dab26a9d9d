"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are pure Column expressions (JVM-side, whole-stage
codegen): tokenization, quality metrics, language-ID scoring, and the
rolling-hash fingerprint fold all run inside Catalyst — no Python in
the scan path.  The design mirrors how the reference keeps per-pixel
work in C kernels and exposes it behind expression surfaces
(frmts/vrt/pixelfunctions.cpp): the expression IS the operator.

Every function takes/returns DataFrames or Columns so the same ops
serve the 100 TB corpus (documents table partitioned by source) and
the catalog's oracle-checked demos.
"""

from __future__ import annotations

from .parallelism import fan_out
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# tiny stopword lexicons for the n-gram/lexicon language heuristic
LEXICONS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "no"],
}

STOPWORDS = LEXICONS["en"]

FP_MOD = 1_000_000_007
FP_MUL = 31


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus contract)."""
    return F.split(text, " ")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# GPT-2-style pretokenizer classes (letters / digits / punctuation
# runs, each optionally preceded by one space) — the BPE-ish token
# estimate a training pipeline budgets by.  Plain character classes
# only, so Java regex (Spark) and RE2 (DuckDB) match identically.
BPE_RE = "( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +)"


def bpe_tokens_col(text: Column) -> Column:
    """BPE-ish pretokens via regexp_extract_all (JVM-side)."""
    return F.regexp_extract_all(text, F.lit(BPE_RE), 1)


def bpe_token_count_col(text: Column) -> Column:
    return F.size(bpe_tokens_col(text))


def stop_ratio_col(toks: Column, words: list[str] | None = None) -> Column:
    """Fraction of tokens found in a stopword lexicon."""
    words = words or STOPWORDS
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_uniq_tokens, avg_tok_len, stop_ratio.

    The quality-score family of a filtering pipeline: cheap, columnar,
    pushdown-friendly (a filter on these reaches the parquet scan of
    the derived table once materialized).
    """
    toks = tokens_col(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_uniq_tokens", F.size(F.array_distinct(toks)))
        .withColumn(
            "avg_tok_len",
            (F.length(F.col(text_col)) - F.size(toks) + 1).cast("double")
            / F.size(toks).cast("double"),
        )
        .withColumn("stop_ratio", stop_ratio_col(toks))
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds score_<lang> columns + lang_pred (argmax, ties -> lexicon
    order).  Lexicon-hit-ratio heuristic — the degenerate-but-
    deterministic cousin of n-gram language ID."""
    toks = tokens_col(F.col(text_col))
    out = df

    def _hits(words):
        return F.size(F.filter(toks, lambda tok: tok.isin(*words)))

    for lang, words in LEXICONS.items():
        out = out.withColumn(
            f"score_{lang}",
            _hits(tuple(words)).cast("double") / F.size(toks).cast("double"),
        )
    pred = None
    best = None
    for lang in LEXICONS:
        s = F.col(f"score_{lang}")
        if pred is None:
            pred, best = F.lit(lang), s
        else:
            pred = F.when(s > best, F.lit(lang)).otherwise(pred)
            best = F.greatest(best, s)
    return out.withColumn("lang_pred", pred)


def fingerprint_col(text: Column) -> Column:
    """Rolling polynomial hash of the text's characters:
    ``acc = (acc * 31 + ascii(ch)) mod 1e9+7`` folded left-to-right —
    a document fingerprint computed entirely JVM-side via
    aggregate(), bounded so the identical fold is expressible in
    checked-arithmetic engines (DuckDB list_reduce oracle)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_MUL + F.ascii(ch)) % FP_MOD,
    )


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and the character mass of the most frequent word
    2-gram.  Pure Column + one exploded groupBy — map-side partials,
    no text ever crosses the shuffle twice.

    Returns (doc_id, dup_tok_frac, top_bigram, top_bigram_frac):
      dup_tok_frac    = 1 - distinct_tokens / tokens
      top_bigram      = most frequent adjacent token pair
                        (count desc, bigram asc ties)
      top_bigram_frac = occurrences * len(bigram) / len(text)
    """
    df = fan_out(df)
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), F.col(text_col).alias("_t"),
                     toks.alias("_toks"))
    counts = base.select(
        id_col,
        F.size("_toks").alias("n_tok"),
        F.size(F.array_distinct("_toks")).alias("n_dis"),
        F.length("_t").alias("n_chars"),
        F.expr("transform(sequence(1, size(_toks) - 1), "
               "i -> concat(element_at(_toks, i), ' ', "
               "element_at(_toks, i + 1)))").alias("_bgs"))
    bg = counts.select(id_col, "n_tok", "n_dis", "n_chars",
                       F.explode("_bgs").alias("bigram"))
    bgc = bg.groupBy(id_col, "n_tok", "n_dis", "n_chars", "bigram").agg(
        F.count("*").alias("bcnt"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("bcnt").desc(), F.col("bigram").asc())
    top = bgc.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1)
    return top.select(
        F.col(id_col),
        F.round(1.0 - F.col("n_dis").cast("double")
                / F.col("n_tok").cast("double"), 6).alias("dup_tok_frac"),
        F.col("bigram").alias("top_bigram"),
        F.round(F.col("bcnt").cast("double")
                * F.length("bigram").cast("double")
                / F.col("n_chars").cast("double"), 6)
        .alias("top_bigram_frac"))


def bm25_topk(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
              k: int = 3) -> DataFrame:
    """Per-document top-k BM25 terms (Robertson/Okapi, the +1 idf
    variant) — the scoring step of corpus search / quality weighting.

    Distribution: one explode -> (doc, term) tf aggregation
    (map-side partials); document frequencies aggregate the same
    rows again grouped by term; N and total token count are one tiny
    global agg joined back by broadcast.  All inputs to the float
    expression are integers, so the score is engine-reproducible.
    Returns (doc_id, term, score) with ties (score desc, term asc).
    """
    toks = fan_out(df).select(
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    dft = tf.groupBy("term").agg(F.count("*").alias("dft"))
    tot = dl.agg(F.count("*").alias("n_docs"),
                 F.sum("dl").alias("tot_tokens"))

    scored = (tf.join(dl, id_col).join(F.broadcast(dft), "term")
              .crossJoin(F.broadcast(tot)))
    avgdl = (F.col("tot_tokens").cast("double")
             / F.col("n_docs").cast("double"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs").cast("double") - F.col("dft") + 0.5)
        / (F.col("dft") + 0.5))
    score = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    w = Window.partitionBy(id_col).orderBy(
        F.round(score, 6).desc(), F.col("term").asc())
    return (scored.withColumn("score", F.round(score, 6))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(id_col, F.col("_rn").cast("long").alias("rnk"),
                    "term", "score"))


def char_bigrams_col(text: Column) -> Column:
    """All character bigrams of a string, JVM-side (sequence +
    substr — no Python)."""
    s = _sql_of(text)
    return F.expr(
        f"CASE WHEN length({s}) >= 2 THEN "
        f"transform(sequence(1, length({s}) - 1), "
        f"i -> substr({s}, i, 2)) "
        f"ELSE array() END")


def _sql_of(col: Column) -> str:
    # Column -> SQL text for use inside F.expr lambdas (Spark's
    # Python lambda API can't parameterize substr positions).
    return col._jc.toString()  # noqa: SLF001


def charlm_train(df: DataFrame, text_col: str = "text") -> tuple:
    """Train an add-one-smoothed character-bigram LM over a corpus —
    the CCNet-style "score every document under a reference LM and
    bucket by perplexity" recipe, with the KenLM stand-in being a
    bigram model the cluster can train in two aggregations.

    Returns (bigram_counts, context_counts, vocab_size_df):
    c2(gram, n2), c1(ctx, n1), and a 1-row vocab size.  All three are
    bounded by charset^2 regardless of corpus size, so every model
    table BROADCASTS at score time — the 10^12-doc path trains with
    two map-side-combined shuffles and scores with zero corpus-side
    shuffle before the final per-doc aggregate.
    """
    grams = fan_out(df).select(F.explode(
        char_bigrams_col(F.col(text_col))).alias("gram"))
    # ONE corpus scan: the aggregates are charset^2-bounded, so
    # collect them and rebuild local DFs — the broadcasts at score
    # time then never re-trigger the gram stream (the lazy form
    # re-scanned the training corpus three times per score action).
    spark = df.sparkSession
    rows2 = grams.groupBy("gram").agg(F.count("*").alias("n2")).collect()
    c2 = spark.createDataFrame(
        [(r["gram"], int(r["n2"])) for r in rows2] or [("", 0)],
        "gram string, n2 long")
    ctx: dict[str, int] = {}
    for r in rows2:
        ctx[r["gram"][:1]] = ctx.get(r["gram"][:1], 0) + int(r["n2"])
    c1 = spark.createDataFrame(
        list(ctx.items()) or [("", 0)], "ctx string, n1 long")
    vocab = spark.createDataFrame([(len(ctx),)], "v long")
    return c2, c1, vocab


def charlm_score(df: DataFrame, model: tuple, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Average negative log-likelihood per character bigram under the
    trained model, add-one smoothed: p(b|a) = (c2 + 1)/(c1 + V).

    Engine-reproducible float discipline: each bigram's log term is
    scaled to an integer (floor(ln(p) * 1e6 + 0.5)) BEFORE summation,
    so the per-doc sum is exact integer arithmetic — independent of
    summation order in either engine (see queries/__init__ conventions).
    Returns (doc_id, n_bigrams, avg_nll).
    """
    c2, c1, vocab = model
    grams = fan_out(df).select(
        F.col(id_col),
        F.explode(char_bigrams_col(F.col(text_col))).alias("gram"))
    grams = grams.withColumn("ctx", F.substring("gram", 1, 1))
    j = (grams.join(F.broadcast(c2), "gram", "left")
         .join(F.broadcast(c1), "ctx", "left")
         .crossJoin(F.broadcast(vocab)))
    p = (F.coalesce(F.col("n2"), F.lit(0)).cast("double") + 1.0) / (
        F.coalesce(F.col("n1"), F.lit(0)).cast("double")
        + F.col("v").cast("double"))
    scaled = F.floor(F.log(p) * 1e6 + F.lit(0.5)).cast("long")
    return (j.select(F.col(id_col), scaled.alias("_s"))
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(-F.sum("_s").cast("double")
                         / F.count("*").cast("double") / 1e6, 6)
                 .alias("avg_nll")))


# kept deliberately simple + RE2-compatible: the same literal pattern
# must compile identically under Java regex (Spark) and RE2 (DuckDB
# oracle) — no backrefs, no possessive quantifiers, no lookaround
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "\\d{3}-\\d{3}-\\d{4}",
    "ip": "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
}


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII tagging + redaction (the anonymization stage of a
    training-data pipeline — CCNet/Dolma-style taggers): per-doc
    match counts for each PII class and the text with every match
    replaced by a <CLASS> token, email -> phone -> ip order.

    Pure JVM regexp Columns (regexp_extract_all / regexp_replace) —
    embarrassingly parallel, zero shuffle, codegen throughout; at
    10^12 docs this is a map-only stage that pipelines with the scan.
    Returns (id, n_email, n_phone, n_ip, redacted).
    """
    counts = [
        F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(pat), F.lit(0))).cast("long")
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


# ------------------------------------------------------------ DSIR
# hashed n-gram importance resampling (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling")

DSIR_BUCKETS = 1024
DSIR_ALPHA = 0.5        # additive smoothing per bucket


def _gram_bucket(gram: Column) -> Column:
    """md5-derived bucket id — the dedup family's digest idiom, so
    the DuckDB twin is ('0x'||substr(md5(g),1,15))::BIGINT with the
    same pmod."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long"),
        F.lit(DSIR_BUCKETS))


def hashed_gram_rows(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, bucket) rows over unigrams + bigrams hashed into
    DSIR_BUCKETS buckets.  Map-only explode; the bucket space is
    fixed, so every aggregate over it is O(buckets) regardless of
    corpus size."""
    df = fan_out(df)
    toks = tokens_col(F.col(text_col))
    uni = df.select(F.col(id_col), F.explode(toks).alias("g"))
    big_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat(F.element_at(toks, i + 1), F.lit(" "),
                               F.element_at(toks, i + 2)))
    ).otherwise(F.array().cast("array<string>"))
    big = df.select(F.col(id_col), F.explode(big_arr).alias("g"))
    return uni.unionByName(big).select(
        F.col(id_col), _gram_bucket(F.col("g")).alias("bucket"))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 ndigits: int = 6) -> DataFrame:
    """Per-document importance weight log p_target(doc)/p_raw(doc)
    under bag-of-hashed-ngrams unigram models (the DSIR estimator):

        w(doc) = sum over the doc's grams of
                 log(c_t[b] + a) - log(N_t + a*K)
               - log(c_r[b] + a) + log(N_r + a*K)

    Scale shape: two O(buckets) aggregates (map-side partials into
    1024 rows) whose totals are two bounded driver actions, the
    1024-row log-ratio table broadcast onto the gram stream, one
    groupBy(id).  The weight is rounded to ``ndigits`` so engine
    log/summation-order ulps cannot flip a comparison.  Returns
    (id, n_grams, dsir_w)."""
    import math

    def bucket_counts(d: DataFrame):
        # ONE corpus scan: the aggregate is <= DSIR_BUCKETS rows, so
        # collect it and rebuild a local DF — the ratio table then
        # never re-triggers the gram stream at action time (the
        # previous shape re-scanned each corpus twice: once for the
        # total, once when the lazily-referenced counts re-executed
        # under the final action).
        rows = (hashed_gram_rows(d, text_col, id_col)
                .groupBy("bucket").agg(F.count("*").alias("c")).collect())
        tot = sum(r["c"] for r in rows)
        cnt = d.sparkSession.createDataFrame(
            [(int(r["bucket"]), int(r["c"])) for r in rows] or
            [(0, 0)], "bucket long, c long")
        return cnt, float(tot) + DSIR_ALPHA * DSIR_BUCKETS

    t_cnt, t_denom = bucket_counts(target)
    r_cnt, r_denom = bucket_counts(raw)
    floor_t = math.log(DSIR_ALPHA) - math.log(t_denom)
    floor_r = math.log(DSIR_ALPHA) - math.log(r_denom)
    ratio = (t_cnt.withColumnRenamed("c", "ct")
             .join(r_cnt.withColumnRenamed("c", "cr"), "bucket", "full")
             .select(
                 "bucket",
                 (F.coalesce(
                     F.log(F.col("ct").cast("double") + F.lit(DSIR_ALPHA))
                     - F.lit(math.log(t_denom)), F.lit(floor_t))
                  - F.coalesce(
                     F.log(F.col("cr").cast("double") + F.lit(DSIR_ALPHA))
                     - F.lit(math.log(r_denom)), F.lit(floor_r))
                  ).alias("lw")))
    grams = hashed_gram_rows(raw, text_col, id_col)
    return (grams.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.round(F.sum("lw"), ndigits).alias("dsir_w")))


def dsir_select(raw: DataFrame, target: DataFrame, keep: int,
                text_col: str = "text", id_col: str = "doc_id"
                ) -> DataFrame:
    """Deterministic DSIR selection: rank by (rounded weight desc,
    id asc), keep the top ``keep`` — the argmax-k variant of
    Gumbel-top-k resampling; identical across engines because the
    rank key is the ROUNDED weight."""
    w = dsir_weights(raw, target, text_col, id_col)
    win = Window.orderBy(F.col("dsir_w").desc(), F.col(id_col).asc())
    return (w.withColumn("rank", F.row_number().over(win).cast("long"))
            .filter(F.col("rank") <= keep)
            .select(id_col, "dsir_w", "rank"))


# ------------------------------------------------------------ URL filter

URL_BLOCK_PATTERNS = {
    # UT1-blocklist-style category regexes (RE2/Java compatible)
    "adult": "(porn|xxx|adult)",
    "gambling": "(casino|bet|poker)",
    "shortener": "^(bit\\.ly|t\\.co|goo\\.gl)$",
}


def url_host_col(url: Column) -> Column:
    """Lower-cased host of an URL (scheme and path stripped) — pure
    regexp Column."""
    return F.lower(F.regexp_extract(url, "^[a-z]+://([^/:?#]+)", 1))


def url_filter(df: DataFrame, blocklist: DataFrame,
               url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Domain filtering (the CCNet / Dolma URL-tagger role): flags a
    document whose host is on the (broadcast) blocklist or matches a
    category pattern.  Map-only plus one broadcast left join — no
    shuffle of the corpus.  Returns (id, host, block_reason), NULL
    reason for clean rows; blocklist beats category patterns, which
    apply in fixed dict order (same precedence in the oracle)."""
    host = url_host_col(F.col(url_col))
    out = df.select(F.col(id_col), host.alias("host"))
    bl = blocklist.select(F.col("host").alias("host"),
                          F.lit("blocklist").alias("_bl"))
    out = out.join(F.broadcast(bl), "host", "left")
    reason = F.col("_bl")
    for name, pat in URL_BLOCK_PATTERNS.items():
        reason = F.coalesce(
            reason, F.when(F.col("host").rlike(pat), F.lit(name)))
    return out.select(id_col, "host", reason.alias("block_reason"))


# ---------------------------------------------- exact substring dedup

SUBSTR_WIN = 40      # window length (chars)
SUBSTR_STEP = 20     # window stride


def substring_dup_spans(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        win: int = SUBSTR_WIN,
                        step: int = SUBSTR_STEP) -> DataFrame:
    """Cross-document exact-substring duplication (the suffix-array
    dedup role of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", at fixed window granularity):
    every ``win``-char window at ``step`` stride is md5-hashed;
    windows whose digest occurs in >= 2 DISTINCT documents are
    duplicated spans.  Returns one row per duplicated (id, off)
    span with the digest's global doc frequency.

    Scale shape: the explode is map-only (fan-out len/step), the
    digest groupBy is one shuffle with map-side partials, and the
    rejoin hits only duplicated digests — the digest exchange is
    the single wide stage, like minhash banding."""
    df = fan_out(df)
    txt = F.col(text_col)
    offs = F.when(
        F.length(txt) >= win,
        F.sequence(F.lit(0), F.length(txt) - win, F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    wins = (df.select(F.col(id_col), txt.alias("_t"),
                      F.explode(offs).alias("off"))
            .select(F.col(id_col), "off",
                    F.md5(F.substring(F.col("_t"), F.col("off") + 1, win))
                    .alias("d")))
    freq = (wins.select(id_col, "d").distinct()
            .groupBy("d").agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= 2))
    return wins.join(freq, "d").select(id_col, "off", "n_docs")


def substring_dup_stats(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        win: int = SUBSTR_WIN,
                        step: int = SUBSTR_STEP) -> DataFrame:
    """Per-document duplicated-window count + duplicated-char
    fraction (stride-weighted upper bound, capped at 1).  Returns
    (id, n_windows, n_dup_windows, dup_frac)."""
    txt = F.col(text_col)
    spans = substring_dup_spans(df, text_col, id_col, win, step)
    n_dup = spans.groupBy(id_col).agg(
        F.count("*").alias("n_dup_windows"))
    base = df.select(
        F.col(id_col),
        F.when(F.length(txt) >= win,
               F.floor((F.length(txt) - win) / step) + 1)
        .otherwise(0).cast("long").alias("n_windows"),
        F.length(txt).cast("long").alias("_len"))
    out = base.join(n_dup, id_col, "left").fillna({"n_dup_windows": 0})
    frac = F.least(
        F.lit(1.0),
        (F.col("n_dup_windows").cast("double") * step)
        / F.col("_len").cast("double"))
    return out.select(
        id_col, "n_windows",
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        F.round(F.when(F.col("_len") > 0, frac).otherwise(0.0), 6)
        .alias("dup_frac"))


# ------------------------------------------------- Gopher rule battery

BULLET_PREFIXES = ("- ", "* ")
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 1000
GOPHER_MIN_AVG_WORD_LEN = 3.0
GOPHER_MAX_AVG_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, Table A1):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (# and ...), bullet-line fraction, ellipsis-line fraction,
    fraction of words containing an alphabetic character, and a
    minimum stop-word hit count.  Every signal is a pure Column
    expression (zero shuffle, map-only — the 100 TB shape), and every
    float is a ratio of integers rounded to 6 so the DuckDB twin
    hash-matches.

    Returns one row per document with each signal plus per-rule
    booleans and the final ``keep`` conjunction.
    """
    txt = F.col(text_col)
    toks = tokens_col(txt)
    lines = F.split(txt, "\\. ")     # sentence-ish lines (corpus is 1-line)
    n_words = F.size(toks)
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    n_sym = (F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
             + (F.length(txt)
                - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / 3)
    n_lines = F.size(lines)
    bullet_lines = F.size(F.filter(
        lines, lambda ln: F.substring(ln, 1, 2).isin(*BULLET_PREFIXES)))
    ellipsis_lines = F.size(F.filter(
        lines, lambda ln: ln.endswith("...")))
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    avg_wl = ((F.length(txt) - n_words + 1).cast("double")
              / n_words.cast("double"))

    sig = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(avg_wl, 6).alias("avg_word_len"),
        F.round(n_sym.cast("double") / n_words.cast("double"), 6)
        .alias("symbol_ratio"),
        F.round(bullet_lines.cast("double") / n_lines.cast("double"), 6)
        .alias("bullet_frac"),
        F.round(ellipsis_lines.cast("double") / n_lines.cast("double"), 6)
        .alias("ellipsis_frac"),
        F.round(n_alpha_words.cast("double") / n_words.cast("double"), 6)
        .alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"))
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("avg_word_len") >= GOPHER_MIN_AVG_WORD_LEN)
        & (F.col("avg_word_len") <= GOPHER_MAX_AVG_WORD_LEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_frac") <= GOPHER_MAX_BULLET_FRAC)
        & (F.col("ellipsis_frac") <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("stop_hits") >= GOPHER_MIN_STOP_HITS))
    return sig.withColumn("keep", keep)


# --------------------------------- hashing-trick linear quality model

QC_BUCKETS = 4096
QC_WEIGHT_SPAN = 1000     # weights in [-1000, 1000], integer
QC_BIAS = -40             # scaled by token count


def _qc_weight(gram: Column) -> Column:
    """Deterministic integer weight for a token: the 'pretrained
    model' is the md5-derived map bucket -> weight, identically
    computable in any engine (the DSIR bucket idiom).  Two
    independent md5 draws: one for the bucket, one for the weight of
    that bucket, so collisions share weights exactly like a real
    hashing-trick model."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("qc:"), gram)), 1, 15),
               16, 10).cast("long"),
        F.lit(QC_BUCKETS))
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("qw:"),
                                          bucket.cast("string"))), 1, 15),
               16, 10).cast("long"),
        F.lit(2 * QC_WEIGHT_SPAN + 1)) - QC_WEIGHT_SPAN


def quality_classifier(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """fastText-style linear quality scorer (the CCNet / RedPajama
    model-based filter role): bag-of-tokens hashed into QC_BUCKETS
    buckets, one integer weight per bucket, logit = mean bucket
    weight + bias.  The whole score is ONE aggregate() fold over the
    token array — zero shuffle, zero explode, exact int64 arithmetic
    until the final division, so a 10^12-doc corpus scores in a
    single map stage and the DuckDB twin hash-matches.

    Returns (id, n_tokens, logit_num, score_u, keep):
      logit_num = sum of token weights + BIAS * n_tokens   (exact)
      score_u   = micro-score: floor(logit_num * 1e6
                  / (n_tokens * QC_WEIGHT_SPAN) + 0.5) as int64 — the
                  engine's scaled-integer convention, NOT round(x, 6):
                  a logit like -1021/16 lands EXACTLY on a decimal
                  half (-0.0638125), where Spark's HALF_UP on the
                  shortest decimal and DuckDB's binary-double
                  rounding disagree by one micro (found by the sf0.1
                  oracle sweep); floor(+0.5) is the same IEEE
                  expression in both engines
      keep      = logit_num > 0
    """
    toks = tokens_col(F.col(text_col))
    wsum = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, tok: acc + _qc_weight(tok))
    n = F.size(toks)
    num = (wsum + F.lit(QC_BIAS) * n).cast("long")
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        num.alias("logit_num"),
        F.floor(num.cast("double") * F.lit(1000000.0)
                / (n.cast("double") * QC_WEIGHT_SPAN)
                + F.lit(0.5)).cast("long").alias("score_u"),
        (num > 0).alias("keep"))


# --------------------------------------------- vocabulary + OOV rate


def build_vocab(df: DataFrame, size: int, text_col: str = "text") -> DataFrame:
    """Top-``size`` word vocabulary by corpus frequency (count desc,
    word asc ties) with contiguous ids — the tokenizer-training /
    vocab-induction step.  One exploded word-count (map-side
    partials) plus a tiny global top-k: the ONLY full-width shuffle
    is the classic word count, and the ranked result is bounded by
    ``size`` so it broadcasts downstream.

    Returns (token_id, term, n) with token_id = 0-based rank.
    """
    counts = (fan_out(df)
              .select(F.explode(tokens_col(F.col(text_col))).alias("term"))
              .groupBy("term").agg(F.count("*").alias("n")))
    # orderBy + limit is a distributed TakeOrdered (per-partition
    # top-k, tiny driver merge) — the global row_number window runs
    # over only the ``size`` survivors, never the full term table.
    top = counts.orderBy(F.col("n").desc(), F.col("term").asc()).limit(size)
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    return (top.withColumn("token_id",
                           F.row_number().over(w).cast("long") - 1)
            .select("token_id", "term", "n"))


def oov_stats(df: DataFrame, vocab: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document out-of-vocabulary statistics against a (small,
    broadcast) vocabulary: explode -> broadcast left join -> per-doc
    reaggregate.  Returns (id, n_tokens, n_oov, oov_rate)."""
    toks = fan_out(df).select(
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("term"))
    v = vocab.select("term", F.lit(1).alias("_in_v"))
    joined = toks.join(F.broadcast(v), "term", "left")
    return (joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("_in_v").isNull(), 1).otherwise(0))
        .cast("long").alias("n_oov"))
        .withColumn("oov_rate",
                    F.round(F.col("n_oov").cast("double")
                            / F.col("n_tokens").cast("double"), 6)))


# ------------------------------------------------------------- winnowing
WINNOW_K = 5       # character k-gram width
WINNOW_W = 4       # winnowing window (guarantee threshold t = w+k-1)
_WN_POSB = 1 << 20  # pos packs into the low 20 bits of the min key


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    MOSS local document fingerprinting): hash every character k-gram,
    slide a w-window over the hash sequence, keep the MINIMUM hash of
    each window (ties -> RIGHTMOST position, the robust-winnowing
    rule), dedupe.  Guarantees any shared substring of length
    >= w + k - 1 yields a shared fingerprint.

    Distribution: one explode to (id, pos, h) rows — k-gram hashing
    is JVM md5 Column math — then ONE window function per document
    partition (min over ROWS CURRENT..w-1 FOLLOWING) and a distinct.
    The tie rule folds into a single integer min key:
    ``h * 2^20 + (2^20 - 1 - pos)`` (docs are capped at 2^20 chars
    per the corpus contract), so the windowed MIN is exactly
    (min h, rightmost pos) — reproducible verbatim in the SQL oracle.
    Returns (id, pos, h) distinct fingerprints.
    """
    grams = fan_out(df).select(
        F.col(id_col),
        F.explode(F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {k - 1},"
            f" 0)), i -> named_struct('pos', i, 'g',"
            f" substring({text_col}, i, {k})))")).alias("kg"),
    ).select(
        id_col, F.col("kg.pos").alias("pos"),
        F.conv(F.substring(F.md5(F.col("kg.g")), 1, 10), 16, 10)
         .cast("long").alias("h"))
    key = (F.col("h") * _WN_POSB
           + (F.lit(_WN_POSB - 1) - F.col("pos")))
    win = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(0, w - 1))
    sel = (grams
           .withColumn("_mk", F.min(key).over(win))
           .withColumn("_cnt", F.count("*").over(win))
           .filter(F.col("_cnt") == w))
    # decode with INTEGER ops only: the key reaches ~2^60, past double
    # precision, so `div` (not float division) recovers h exactly.
    return (sel.select(
        F.col(id_col),
        (F.lit(_WN_POSB - 1) - F.pmod("_mk", F.lit(_WN_POSB)))
        .alias("pos"),
        F.expr(f"_mk div {_WN_POSB}").alias("h"))
        .distinct())


# ------------------------------------------- n-gram language ID (C&T 1994)
CT_K = 40       # profile length
CT_N = 3        # char n-gram width


def char_ngram_rows(df: DataFrame, text_col: str, id_cols: list[str],
                    n: int = CT_N) -> DataFrame:
    """(id_cols..., g) rows of lowercased char n-grams — JVM explode."""
    return fan_out(df).select(
        *id_cols,
        F.explode(F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {n - 1},"
            f" 0)), i -> substring(lower({text_col}), i, {n}))")).alias("g"))


def ngram_lang_profiles(df: DataFrame, text_col: str = "text",
                        lang_col: str = "lang", k: int = CT_K) -> DataFrame:
    """Cavnar-Trenkle training: per-language top-k char n-grams ranked
    by (count desc, gram asc).  One groupBy + one window over a
    langs x grams table — the profile output is tiny (langs * k rows),
    broadcastable to any corpus size."""
    cnt = (char_ngram_rows(df, text_col, [lang_col])
           .groupBy(lang_col, "g").agg(F.count("*").alias("c")))
    w = Window.partitionBy(lang_col).orderBy(F.desc("c"), F.asc("g"))
    return (cnt.withColumn("pr", F.row_number().over(w))
            .filter(F.col("pr") <= k).select(lang_col, "g", "pr"))


def ngram_lang_id(df: DataFrame, profiles: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang", k: int = CT_K) -> DataFrame:
    """Cavnar-Trenkle classification (the published rank-order
    distance): build each document's own top-k n-gram ranks, compare
    against every language profile — |doc_rank - profile_rank| per
    gram, out-of-profile grams cost k — and keep the argmin language
    (ties -> lang asc).

    Scale shape: doc ranks are one groupBy + per-doc window; the
    profile is broadcast; the distance is one map-side-combinable
    aggregate per (doc, lang).  Returns (id, lang_pred, dist).
    """
    dcnt = (char_ngram_rows(df, text_col, [id_col])
            .groupBy(id_col, "g").agg(F.count("*").alias("c")))
    w = Window.partitionBy(id_col).orderBy(F.desc("c"), F.asc("g"))
    dr = (dcnt.withColumn("dr", F.row_number().over(w))
          .filter(F.col("dr") <= k).select(id_col, "g", "dr"))
    langs = profiles.select(lang_col).distinct()
    cand = dr.crossJoin(F.broadcast(langs))
    scored = cand.join(F.broadcast(profiles), [lang_col, "g"], "left")
    dist = (scored.groupBy(id_col, lang_col)
            .agg(F.sum(F.coalesce(F.abs(F.col("dr") - F.col("pr")),
                                  F.lit(k))).alias("dist")))
    w2 = Window.partitionBy(id_col).orderBy(F.asc("dist"),
                                            F.asc(lang_col))
    return (dist.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col), F.col(lang_col).alias("lang_pred"),
                    "dist"))

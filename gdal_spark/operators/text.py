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
    toks = df.select(F.col(id_col),
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
    grams = df.select(F.explode(
        char_bigrams_col(F.col(text_col))).alias("gram"))
    c2 = grams.groupBy("gram").agg(F.count("*").alias("n2"))
    c1 = (grams.select(F.substring("gram", 1, 1).alias("ctx"))
          .groupBy("ctx").agg(F.count("*").alias("n1")))
    vocab = c1.agg(F.count("*").alias("v"))
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
    grams = df.select(
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

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

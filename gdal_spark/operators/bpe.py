"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, the public byte-pair-encoding merge rule) — a training-data
pipeline op alongside dedup/quality/DSIR.

Scale shape (the reason this works at 100 TB):

* the corpus is collapsed ONCE to a distinct-word frequency table
  (classic word count: map-side-combinable groupBy) — every later
  round runs over distinct words weighted by freq, never the corpus;
* each merge round is ONE map-side-combinable aggregation (explode
  adjacent token pairs, sum freq) plus a top-1 collect — the driver
  holds only the argmax pair per round, exactly the bounded-driver
  pattern of operators/similarity.py::kmeans_centroids;
* applying a merge is a token-boundary-anchored greedy fold: one JVM
  ``aggregate`` over the split token list, appending each token and
  fusing it with the accumulator tail iff the LAST TOKEN equals
  ``left`` and the incoming token equals ``right`` — exactly
  Sennrich's within-word greedy left-to-right merge.  A plain
  substring ``replace(s, left||US||right, ...)`` is WRONG here: the
  pattern also matches where ``left`` is merely a suffix of the
  preceding token (after (t,h)->'th', a later (h,e) merge would fuse
  'th'|'e' into 'the'), which real BPE never does — see
  tests/test_bpe_boundaries.py;
* the fold references the token-string column exactly ONCE per round
  (the accumulator is a lambda variable), so the 12-round expression
  chain stays linear in Catalyst — no multi-reference inlining blowup;
* lineage is re-materialized every few rounds so the plan stays flat.

Token strings join tokens with chr(31) (unit separator); tokens never
contain it, so "last token == left" is exactly "acc == left OR acc
ends with US||left".  The catalog oracle (queries/pipeline.py)
re-derives the whole procedure as K unrolled SQL rounds in DuckDB —
pair extraction by list indexing, same tie-break (count DESC, pair
ASC), the same boundary-anchored greedy fold via ``list_reduce`` —
fully independent of this code.
"""

from __future__ import annotations

from .parallelism import fan_out
from pyspark.sql import Column, DataFrame, functions as F

SEP = "\x1f"
WORD_RE = "[a-z]+"
_REMAT_EVERY = 8


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table (word, freq) — the only pass
    over the full corpus."""
    words = fan_out(docs).select(F.explode(
        F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
    ).alias("word"))
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _pairs_col(s_col: str) -> Column:
    """Adjacent token pairs of the sep-joined string, as sep-joined
    pair strings (empty array for single-token words)."""
    return F.expr(
        f"zip_with(slice(split({s_col}, chr(31)), 1,"
        f" size(split({s_col}, chr(31))) - 1),"
        f" slice(split({s_col}, chr(31)), 2,"
        f" size(split({s_col}, chr(31))) - 1),"
        " (a, b) -> concat(a, chr(31), b))")


def bpe_train(docs: DataFrame, text_col: str = "text",
              num_merges: int = 12) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, count)]
    in rank order.  Deterministic: ties break on the pair string
    ascending (binary compare, same in the SQL oracle)."""
    wf = word_freqs(docs, text_col).withColumn(
        "s", F.expr("array_join(split(word, ''), chr(31))"))
    wf = wf.select("s", "freq").persist()
    wf.count()

    merges: list[tuple[str, str, int]] = []
    cur = wf
    for r in range(num_merges):
        top = (cur.select(F.explode(_pairs_col("s")).alias("pair"), "freq")
                  .groupBy("pair").agg(F.sum("freq").alias("cnt"))
                  .orderBy(F.desc("cnt"), F.asc("pair"))
                  .limit(1).collect())
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        left, right = pair.split(SEP)
        merges.append((left, right, cnt))
        cur = cur.withColumn("s", F.expr(_merge_expr("s", left, right)))
        if (r + 1) % _REMAT_EVERY == 0:
            nxt = cur.persist()
            nxt.count()
            cur = nxt
    wf.unpersist()
    return merges


def _q(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(s_expr: str, left: str, right: str) -> str:
    """SQL expr applying one merge round to a sep-joined token string:
    greedy left-to-right fold that fuses (left, right) only at token
    boundaries.  ``s_expr`` is referenced exactly once (linear plan)."""
    lq, rq = _q(left), _q(right)
    return (
        "aggregate(split(%s, chr(31)), cast(null as string),"
        " (acc, x) -> CASE"
        " WHEN acc IS NULL THEN x"
        " WHEN (acc = '%s' OR endswith(acc, concat(chr(31), '%s')))"
        " AND x = '%s' THEN concat(acc, x)"
        " ELSE concat(acc, chr(31), x) END)"
        % (s_expr, lq, lq, rq))


def bpe_tokens_col(word_col: str,
                   merges: list[tuple[str, str, int]]) -> Column:
    """Tokenize a word column with trained merges: char split + the
    boundary-anchored greedy fold per merge in rank order — pure
    Column math, returns array<string> of BPE tokens."""
    s = f"array_join(split({word_col}, ''), chr(31))"
    for left, right, _ in merges:
        s = _merge_expr(s, left, right)
    return F.expr(f"split({s}, chr(31))")

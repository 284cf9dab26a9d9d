"""Sequence packing: concat-then-chunk document -> training-sequence
assignment (the GPT pre-training packing step).

Semantics: documents are laid end-to-end in a deterministic global
order (ascending ``id_col``), the token stream is cut every
``seq_len`` tokens, and each document is assigned to every sequence
it overlaps with its in-doc/in-seq token ranges — exactly what a
tokenize-and-pack job emits before writing training shards.

Scale shape (the reason this is not a window over the whole corpus):
the global token offset is a TWO-LEVEL PARALLEL PREFIX SUM —

  1. docs bucket by ``id DIV bucket_size`` (monotone in the order
     key, so bucket boundaries respect the global order);
  2. per-bucket token totals aggregate with map-side partials into a
     ``n_docs / bucket_size``-row table; the running base offset per
     bucket is a window over THAT tiny table only;
  3. the within-bucket running sum is a window partitioned BY BUCKET
     — every window partition holds ``bucket_size`` rows, so no
     executor ever sorts more than a bucket.

At 10^12 docs with bucket_size=2^20 the bucket table is ~10^6 rows —
still driver-broadcastable — and no stage materializes a global sort.
All arithmetic is int64 (DIV, not float division), so the DuckDB
oracle reproduces every offset exactly.

Reference role: GDAL has no packing analogue; this exists for the
100-TB training-data brief (same family as dedup/DSIR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .text import tokens_col

DEFAULT_BUCKET = 1 << 20


def pack_sequences(df: DataFrame, seq_len: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   bucket_size: int = DEFAULT_BUCKET) -> DataFrame:
    """Assign each document to the fixed-length training sequences it
    overlaps.  Returns one row per (doc, sequence) overlap:

      (id, seq_id, doc_tok_start, doc_tok_end, seq_tok_start, n_toks)

    with doc_tok_end exclusive, token counts by whitespace (swap
    ``tokens_col`` for the BPE counter upstream if budgeting BPE).
    """
    nt = df.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("_n"),
        F.expr(f"{id_col} DIV {bucket_size}").alias("_bk"))

    # level 1: per-bucket totals (tiny), running base via a window
    # over the bucket table only
    bsum = nt.groupBy("_bk").agg(F.sum("_n").alias("_bn"))
    wb = Window.orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, -1)
    base = bsum.withColumn(
        "_base", F.coalesce(F.sum("_bn").over(wb), F.lit(0)).cast("long"))

    # level 2: within-bucket prefix, bounded window partitions
    ww = Window.partitionBy("_bk").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1)
    off = (nt.join(F.broadcast(base.select("_bk", "_base")), "_bk")
           .withColumn("_off",
                       (F.col("_base")
                        + F.coalesce(F.sum("_n").over(ww), F.lit(0)))
                       .cast("long")))

    first = F.expr(f"_off DIV {seq_len}")
    last = F.expr(f"(_off + _n - 1) DIV {seq_len}")
    ex = off.filter(F.col("_n") > 0).select(
        F.col(id_col), "_n", "_off",
        F.explode(F.sequence(first, last)).alias("seq_id"))
    seq_start = F.col("seq_id") * seq_len
    return ex.select(
        F.col(id_col),
        F.col("seq_id").cast("long").alias("seq_id"),
        F.greatest(seq_start - F.col("_off"), F.lit(0)).cast("long")
        .alias("doc_tok_start"),
        (F.least((F.col("seq_id") + 1) * seq_len, F.col("_off") + F.col("_n"))
         - F.col("_off")).cast("long").alias("doc_tok_end"),
        (F.greatest(F.col("_off"), seq_start) - seq_start).cast("long")
        .alias("seq_tok_start"),
        (F.least((F.col("seq_id") + 1) * seq_len, F.col("_off") + F.col("_n"))
         - F.greatest(F.col("_off"), seq_start)).cast("long")
        .alias("n_toks"))

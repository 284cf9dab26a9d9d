"""End-to-end training-corpus pipeline: spark-submit --py-files job
composing the LLM-data operators under per-stage lineage, resumable.

    spark-submit --py-files gdal_spark.zip jobs/corpus_pipeline.py \
        --in-dir /root/testdata/sf0.01 --out-dir /tmp/corpus_out \
        [--resume] [--cpus 8] [--hash-units 8]

Stages (each one a lineage-committed, --resume-exact unit set — the
Iceberg-snapshot role of operators/lineage.py):

  1. quality   — Gopher rule battery (Rae 2021), keep-conjunction
                 filter; pure Column, zero shuffle.
  2. dedup     — exact dedup (md5 groupBy, keep lowest doc_id) THEN
                 MinHash->Jaccard near-dup clusters (salted band
                 join), keep the canonical (lowest id) per cluster.
  3. scrub     — PII redaction (email/phone/ip -> <CLASS> tokens),
                 JVM regexp Columns.
  4. stats     — per-doc token counts (whitespace + BPE-ish pretokens)
                 + winnowing fingerprint count; written alongside.

Output units are hash(doc_id) % n buckets, so a killed run resumes
with the exact remaining buckets (tests/test_lineage.py semantics).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--hash-units", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark.operators import dedup as dd
    from gdal_spark.operators import lineage as ln
    from gdal_spark.operators import text as tx
    from gdal_spark.session import get_spark

    spark = get_spark("corpus-pipeline", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    run_id = f"corpus-{int(time.time())}" if not args.resume else "resume"

    docs = spark.read.parquet(f"{args.in_dir}/documents.parquet")

    # stage 1: quality keep set
    q = tx.gopher_rules(docs).filter(F.col("keep")) \
        .select("doc_id").join(docs, "doc_id")

    # stage 2: exact dedup (keep lowest id per md5 group, one
    # map-side-combinable shuffle) ...
    keep_exact = (q.select("doc_id", F.md5("text").alias("_d"))
                  .groupBy("_d").agg(F.min("doc_id").alias("doc_id"))
                  .select("doc_id"))
    q2 = keep_exact.join(q, "doc_id")
    # ... then near-dup canonical selection
    clusters = dd.neardup_clusters(q2)
    q3 = clusters.filter(F.col("keep")).select("doc_id").join(q2, "doc_id")

    # stage 3: PII scrub (text replaced in place)
    scr = tx.pii_scrub(q3).select("doc_id", "redacted")
    clean = (q3.drop("text").join(scr, "doc_id")
             .withColumnRenamed("redacted", "text"))

    # stage 4: stats
    final = (clean
             .withColumn("n_tokens", tx.token_count_col(F.col("text")))
             .withColumn("n_bpe_tokens",
                         tx.bpe_token_count_col(F.col("text"))))

    # lineage-committed write: hash(doc_id) buckets as resume units
    nun = args.hash_units
    keyed = final.withColumn(
        "_unit", F.pmod(F.xxhash64("doc_id"), F.lit(nun)).cast("int"))
    keyed = keyed.persist()
    keyed.count()

    def unit_fn(u):
        return keyed.filter(F.col("_unit") == u).drop("_unit")

    results = ln.run_stage(spark, args.out_dir, run_id, "corpus",
                           list(range(nun)), unit_fn)
    keyed.unpersist()

    out = ln.read_stage(spark, args.out_dir)
    n_in = docs.count()
    n_out = out.count()
    print(f"PIPELINE_DONE in={n_in} out={n_out} "
          f"units_committed_now={len(results)} run_id={run_id}")
    spark.stop()


if __name__ == "__main__":
    main()

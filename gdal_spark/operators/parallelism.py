"""Scan-width guard for explode-heavy pipelines.

Spark sizes scan splits by BYTES (spark.sql.files.maxPartitionBytes),
but the text/dedup operators multiply row volume by 2-3 orders of
magnitude (char bigrams, k-gram windows, shingles) BEFORE their first
shuffle.  A compact parquet file — small corpus, or a heavily
dictionary-compressed shard — then funnels the whole expansion plus
its map-side partial aggregation into ONE task (observed at the sf1
rehearsal: charlm_score's hash aggregate spilling for 14+ minutes on
a single task over a 1.1 MB documents file).  The reference engine
has the same contract from the other side: GDAL sizes work by blocks,
not by compressed bytes (gcore/gdalrasterband.cpp block model).

``fan_out`` round-robins the PRE-explode rows across the cluster when
the scan is narrower than the available parallelism — moving the raw
documents (cheap, bytes-sized) so the expansion and its partial
aggregation run wide.  On a 100 TB corpus the scan is already wider
than the cluster and this is a no-op; it exists for the opposite
skew, where bytes under-estimate work.

Every caller feeds order-independent aggregations (integer-scaled
logs, min-hash, counts), so the round-robin placement never changes
results — the driver oracle gate stays hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism iff its
    current physical partitioning is narrower.  No-op (and no shuffle)
    when the input is already at least that wide."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (streaming etc.)
        return df
    if n < target:
        return df.repartition(target)
    return df

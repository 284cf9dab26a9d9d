"""Deterministic sampling for training-data pipelines.

No reference analogue (the reference is a geospatial engine); these
are the corpus-curation primitives a 100-TB pipeline runs between
dedup and training: per-stratum quotas and reproducible Bernoulli
subsampling.  Both are hash-deterministic (md5 of the id), so runs
are reproducible across clusters, sessions and engines — which also
makes them value-exact oracle-checkable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _hash_key(id_col: Column) -> Column:
    """Stable per-row sort key: md5 of the decimal id string."""
    return F.md5(id_col.cast("string"))


def stratified_sample(df: DataFrame, group_cols: list[str], k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    rank = row_number over (stratum, ORDER BY md5(id), id) — one
    shuffle on the stratum key; skewed strata are bounded by the
    window's partial top-k (rank <= k prunes before the final sort
    at scale via AQE).  Ties cannot occur (md5 collisions resolved
    by id).
    """
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_key(F.col(id_col)), F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def hash_sample(df: DataFrame, fraction: float,
                id_col: str = "doc_id") -> DataFrame:
    """Reproducible Bernoulli sample: keep iff the first 8 hex chars
    of md5(id) fall under fraction * 2^32.  Scan-only (no shuffle),
    stable under repartitioning — unlike DataFrame.sample, whose
    output depends on partition layout.
    """
    threshold = int(fraction * (1 << 32))
    bucket = F.conv(F.substring(_hash_key(F.col(id_col)), 1, 8), 16, 10)
    return df.filter(bucket.cast("long") < threshold)

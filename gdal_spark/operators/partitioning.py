"""Spatial partitioning: Hilbert-ordered range partitioning + hot-cell
salting decisions.

north_rule: "range-partitioned by Hilbert-sorted cell id".  The
Hilbert key (packedrtree.cpp:74-161 bit algebra) linearizes 2-D
locality, so repartitionByRange on it puts spatially-near rows in
the same partition/file — the engine's layout-level substitute for
secondary spatial indexes (SURVEY §4.1): parquet min/max stats on
the key give file skipping for cell-range queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import functions as gf


def with_hilbert_key(df: DataFrame, x_col: str = "x", y_col: str = "y",
                     minx: float = 0.0, miny: float = 0.0,
                     width: float = 1.0, height: float = 1.0) -> DataFrame:
    """Attach the uint32 Hilbert key of each row's point (Arrow numpy
    kernel — see BENCH.md on why not the Column twin for bulk)."""
    def g(v, mn, ext):
        raw = F.floor((F.lit(65535.0) * (F.col(v) - F.lit(mn))) / F.lit(ext))
        return F.greatest(F.lit(0), F.least(F.lit(65535), raw)).cast("long")

    return df.withColumn(
        "hkey",
        gf.hilbert_u32_pandas(g(x_col, minx, width), g(y_col, miny, height)),
    )


def repartition_by_hilbert(df: DataFrame, n_partitions: int,
                           x_col: str = "x", y_col: str = "y",
                           minx: float = 0.0, miny: float = 0.0,
                           width: float = 1.0, height: float = 1.0) -> DataFrame:
    """Range-partition by Hilbert key: spatially-near rows co-locate,
    partition boundaries are contiguous key ranges (sampled by Spark's
    RangePartitioner), and a sortWithinPartitions makes parquet row
    groups carry tight hkey min/max for file skipping."""
    keyed = with_hilbert_key(df, x_col, y_col, minx, miny, width, height)
    return keyed.repartitionByRange(n_partitions, "hkey").sortWithinPartitions(
        "hkey")


def cell_histogram(df: DataFrame, cell_col: str = "cell",
                   top_k: int = 20) -> DataFrame:
    """Hot-cell histogram — the skew diagnostic that drives the salt
    factor of the spatial join (north_rule hot-cell salting)."""
    return (
        df.groupBy(cell_col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc())
        .limit(top_k)
    )


def choose_salt(df: DataFrame, cell_col: str = "cell",
                skew_threshold: float = 4.0, max_salt: int = 16) -> int:
    """Salt factor from the cell histogram: ratio of the hottest cell
    to the mean cell load, clamped — 0 means no salting needed."""
    stats = df.groupBy(cell_col).agg(F.count("*").alias("n")).agg(
        F.max("n").alias("mx"), F.avg("n").alias("mean")).collect()[0]
    if not stats["mean"]:
        return 0
    ratio = stats["mx"] / stats["mean"]
    if ratio < skew_threshold:
        return 0
    return min(max_salt, int(ratio // skew_threshold) + 1)

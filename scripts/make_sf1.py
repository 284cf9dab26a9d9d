"""Deterministic sf1 synthesis: replicate the driver's sf0.1 tables
10x with key remapping, so every PK/FK relationship (and therefore
every join fan-out and per-group cardinality) scales exactly 10x.

The driver ships sf{0.001,0.01,0.1}; the judge's round-5 scale
rehearsal needs one decade more.  Replica r shifts every key column
by r*STRIDE (a power of ten above any key in any table), and FK
columns shift by the same amount, so replica r's facts reference
replica r's dims — the scaled dataset is 10 disjoint copies of the
sf0.1 universe under one schema, which is exactly how a 10x corpus
grows when each shard has the same internal structure.  region and
nation keep their fixed TPC-H size (dims that do not scale with sf).

Non-key content columns are left byte-identical; `doc_id`-derived
geo points (queries/_derive.py) therefore repeat per replica, which
preserves the spatial join's per-cell density profile while scaling
total rows — the property the rehearsal is probing.

Run: python scripts/make_sf1.py [out_dir] [factor]
  default out_dir /root/repo/.scratch/sf1, factor 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000          # > max key in any sf0.1 table (~6e5)

# key columns to shift per replica: table -> columns
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]   # fixed-size dims


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from gdal_spark.session import get_spark

    spark = get_spark("make-sf1", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(out_dir, exist_ok=True)
    for name in COPY:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: copied")

    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    for name, keys in SHIFT.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        cols = df.columns
        big = df.crossJoin(F.broadcast(reps))
        for k in keys:
            big = big.withColumn(
                k, (F.col(k) + F.col("__rep") * F.lit(STRIDE))
                .cast(dict(df.dtypes)[k]))
        # Write ``factor`` part files: the driver's sf tables are one
        # compact file each, and a single 10x-bigger-but-still-small
        # file would give every downstream scan exactly ONE split
        # (bytes-based splitting can't cut inside a row group) — the
        # rehearsal would then measure layout, not the engine.
        big.select(*cols).repartition(factor).write.mode(
            "overwrite").parquet(f"{out_dir}/{name}.parquet")
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()

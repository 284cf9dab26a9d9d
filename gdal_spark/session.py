"""SparkSession factory with engine-tuned defaults.

Scale posture (100 TB / 1000-executor design, local[N] test harness):
AQE on (runtime re-plan + skew-join splitting), Arrow on (every
pandas UDF boundary is Arrow-batched), small default advisory
partition sizes appropriate for the sandbox but overridable via env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "gdal_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # This engine's shuffle stages carry compute fan-out far out
        # of proportion to their byte size: a few MB of minhash/simhash
        # signatures expand to 10^8 candidate pairs inside the
        # following self-join stage, and a few MB of WKB drives heavy
        # geometry kernels.  AQE's coalescing is shuffle-BYTE-based
        # (default floor 1 MB/partition), which folded those stages to
        # 2-3 tasks at the sf1 rehearsal (observed: simhash_pairs'
        # candidate aggregate spilling for minutes on 2 tasks while 30
        # cores idled).  Lower the floor so parallelism-first sizing
        # keeps fan-out stages wide; at real 100 TB scale shuffles are
        # GBs and this floor never binds.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "64k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()

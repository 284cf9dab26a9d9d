"""Per-partition lineage records + resumable idempotent writes.

north_rule: "Each partition writes lineage records (input split, cell
range, row counts, checksum) to a checkpoint table so failed stages
resume exactly."  The reference's precedent is tile-job resume —
``gdal raster tile --resume`` skips already-written tiles
(/root/reference/apps/gdalalg_raster_tile.cpp:213,4186; gdal2tiles
/root/reference/swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:1497).

Spark rendering: output is partitioned by a deterministic unit key
(tile id, cell range, split id).  A run writes each unit's rows to
``<out>/data/unit=<k>`` and appends one lineage row
(run_id, stage, unit, row_count, checksum, committed_at) AFTER the
unit's data lands.  Restart = anti-join the unit list against
committed lineage — only missing units recompute.  Unit writes are
idempotent (overwrite-by-unit), so a crash between data and lineage
re-runs that unit harmlessly.  This gives exactly-once OUTPUT without
an Iceberg dependency (none ships in this sandbox); with Iceberg the
same records ride a snapshot commit.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "run_id string, stage string, unit bigint, input_split string, "
    "cell_min bigint, cell_max bigint, row_count bigint, checksum bigint, "
    "committed_at double"
)


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    path = _lineage_path(out_dir)
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def committed_units(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return (
        read_lineage(spark, out_dir)
        .filter(F.col("stage") == stage)
        .select("unit")
        .distinct()
    )


def pending_units(units: DataFrame, spark: SparkSession, out_dir: str,
                  stage: str) -> DataFrame:
    """units DF(unit bigint, ...) minus already-committed units — the
    anti-join restart of the reference's --resume tile skip."""
    done = committed_units(spark, out_dir, stage)
    return units.join(done, "unit", "left_anti")


def commit_unit(spark: SparkSession, out_dir: str, run_id: str, stage: str,
                unit: int, df: DataFrame, input_split: str = "",
                cell_min: int = 0, cell_max: int = 0) -> dict:
    """Write one unit's rows idempotently, then append its lineage row.

    Returns the lineage record.  checksum = xor of row hashes
    (order-independent, cheap, distributed).
    """
    data_path = os.path.join(out_dir, "data", f"unit={unit}")
    df.write.mode("overwrite").parquet(data_path)
    back = spark.read.parquet(data_path)
    agg = back.agg(
        F.count("*").alias("n"),
        # xor-fold of row hashes: commutative, overflow-free
        F.coalesce(F.bit_xor(F.xxhash64(*back.columns)), F.lit(0)).alias("ck"),
    ).collect()[0]
    rec = {
        "run_id": run_id, "stage": stage, "unit": int(unit),
        "input_split": input_split,
        "cell_min": int(cell_min), "cell_max": int(cell_max),
        "row_count": int(agg["n"]), "checksum": int(agg["ck"]),
        "committed_at": time.time(),
    }
    spark.createDataFrame([rec], LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append").parquet(_lineage_path(out_dir))
    return rec


def commit_partitioned(spark: SparkSession, out_dir: str, run_id: str,
                       stage: str, df: DataFrame,
                       unit_col: str = "unit") -> list[dict]:
    """Commit EVERY pending unit of ``df`` in ONE distributed job.

    The round-1 ``run_stage`` loop launched one Spark job (plus a
    coalesce(1) lineage append) per unit — 10^5 units means 10^5
    sequential jobs.  Here the whole stage is a single
    ``groupBy(unit).applyInPandas`` job: each task owns one unit,
    writes its data file idempotently (deterministic path,
    overwrite), computes the unit's row count + order-independent
    checksum, and then writes the unit's lineage record — data
    strictly before lineage, so a task killed mid-write leaves the
    unit uncommitted and the anti-join resume recomputes exactly it.
    Units that finished keep their lineage rows; a restart touches
    only the missing ones.  (Local-FS file writes model the atomic
    per-unit commit; on a production store the same records ride an
    Iceberg snapshot / task-commit protocol.)

    Units are the caller's partition grain (tile blocks, cell
    ranges): one unit must fit one task, like any applyInPandas
    group.  Returns the lineage records committed by THIS run.
    """
    import pandas as pd

    work = df.withColumnRenamed(unit_col, "unit") if unit_col != "unit" else df
    pend = pending_units(work.select("unit").distinct(), spark, out_dir, stage)
    work = work.join(pend, "unit", "left_semi")
    data_cols = [c for c in work.columns if c != "unit"]
    data_root = os.path.join(out_dir, "data")
    lineage_root = _lineage_path(out_dir)

    def _commit(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pyarrow as pa
        import pyarrow.parquet as pq

        unit = int(key[0])
        body = pdf[data_cols]
        hashes = pd.util.hash_pandas_object(body, index=False).to_numpy()
        ck = 0
        for h in hashes:
            ck ^= int(h)
        ck = ck - (1 << 64) if ck >= (1 << 63) else ck

        unit_dir = os.path.join(data_root, f"unit={unit}")
        os.makedirs(unit_dir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False),
                       os.path.join(unit_dir, "part-0.parquet"))

        rec = {
            "run_id": run_id, "stage": stage, "unit": unit,
            "input_split": "", "cell_min": 0, "cell_max": 0,
            "row_count": len(body), "checksum": ck,
            "committed_at": time.time(),
        }
        os.makedirs(lineage_root, exist_ok=True)
        # ':' etc. in stage names break Hadoop's Path URI parsing
        safe_stage = "".join(
            c if c.isalnum() or c in "-_" else "_" for c in stage)
        ltab = pa.table({
            "run_id": pa.array([rec["run_id"]], pa.string()),
            "stage": pa.array([rec["stage"]], pa.string()),
            "unit": pa.array([rec["unit"]], pa.int64()),
            "input_split": pa.array([rec["input_split"]], pa.string()),
            "cell_min": pa.array([rec["cell_min"]], pa.int64()),
            "cell_max": pa.array([rec["cell_max"]], pa.int64()),
            "row_count": pa.array([rec["row_count"]], pa.int64()),
            "checksum": pa.array([rec["checksum"]], pa.int64()),
            "committed_at": pa.array([rec["committed_at"]], pa.float64()),
        })
        pq.write_table(
            ltab, os.path.join(lineage_root, f"{safe_stage}_u{unit}.parquet"))
        return pd.DataFrame([rec])

    out = work.groupBy("unit").applyInPandas(_commit, LINEAGE_SCHEMA)
    return [r.asDict() for r in out.collect()]


def run_stage(spark: SparkSession, out_dir: str, run_id: str, stage: str,
              units: list[int], unit_fn, meta_fn=None) -> list[dict]:
    """Run a stage resumably: for each pending unit, materialize
    ``unit_fn(unit) -> DataFrame`` and commit it with lineage.

    Already-committed units are skipped exactly (--resume semantics).
    meta_fn(unit) may supply (input_split, cell_min, cell_max).
    """
    done = {
        r["unit"]
        for r in committed_units(spark, out_dir, stage).collect()
    }
    out = []
    for u in units:
        if u in done:
            continue
        split, cmin, cmax = ("", 0, 0) if meta_fn is None else meta_fn(u)
        out.append(
            commit_unit(spark, out_dir, run_id, stage, u, unit_fn(u),
                        input_split=split, cell_min=cmin, cell_max=cmax)
        )
    return out


def read_stage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))

"""Resume-exactly semantics of the lineage/checkpoint layer."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import lineage as ln


@pytest.fixture()
def out_dir():
    d = tempfile.mkdtemp(prefix="lineage_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _unit_fn(spark):
    def fn(u):
        return spark.range(100 * u, 100 * u + 100).select(
            F.col("id"), (F.col("id") * 3).alias("v"))
    return fn


def test_stage_runs_and_commits(spark, out_dir):
    recs = ln.run_stage(spark, out_dir, "run1", "s1", [1, 2, 3],
                        _unit_fn(spark))
    assert len(recs) == 3
    assert all(r["row_count"] == 100 for r in recs)
    assert ln.read_stage(spark, out_dir).count() == 300
    lg = ln.read_lineage(spark, out_dir)
    assert lg.count() == 3


def test_resume_skips_committed(spark, out_dir):
    ln.run_stage(spark, out_dir, "run1", "s1", [1, 2], _unit_fn(spark))
    # second run with a superset of units: only the new one executes
    recs = ln.run_stage(spark, out_dir, "run2", "s1", [1, 2, 3],
                        _unit_fn(spark))
    assert [r["unit"] for r in recs] == [3]
    assert ln.read_stage(spark, out_dir).count() == 300
    # lineage keeps per-run provenance
    lg = ln.read_lineage(spark, out_dir)
    assert lg.filter(F.col("run_id") == "run2").count() == 1


def test_recommit_is_idempotent(spark, out_dir):
    fn = _unit_fn(spark)
    a = ln.commit_unit(spark, out_dir, "r1", "s1", 7, fn(7))
    b = ln.commit_unit(spark, out_dir, "r2", "s1", 7, fn(7))
    assert a["row_count"] == b["row_count"] == 100
    assert a["checksum"] == b["checksum"]
    # data not duplicated by the re-commit (overwrite-by-unit)
    assert ln.read_stage(spark, out_dir).count() == 100


def test_pending_units_anti_join(spark, out_dir):
    ln.run_stage(spark, out_dir, "r1", "s1", [5], _unit_fn(spark))
    units = spark.range(4, 8).select(F.col("id").alias("unit"))
    pending = sorted(
        r["unit"] for r in ln.pending_units(units, spark, out_dir, "s1").collect()
    )
    assert pending == [4, 6, 7]


def _unit_df2(spark, units):
    """One DF spanning several units, 100 rows each."""
    out = None
    for u in units:
        d = spark.range(100 * u, 100 * u + 100).select(
            F.lit(u).alias("unit"), F.col("id"), (F.col("id") * 3).alias("v"))
        out = d if out is None else out.unionByName(d)
    return out


def test_partitioned_commit_one_job(spark, out_dir):
    recs = ln.commit_partitioned(
        spark, out_dir, "run1", "s1", _unit_df2(spark, range(12)))
    assert len(recs) == 12
    assert all(r["row_count"] == 100 for r in recs)
    assert ln.read_stage(spark, out_dir).count() == 1200
    assert ln.read_lineage(spark, out_dir).count() == 12


def test_partitioned_resume_recomputes_only_pending(spark, out_dir):
    """Killed-restart contract: delete two units' data + lineage (a
    crash before their per-task commit), rerun — only those two
    recompute (their lineage rows carry the new run_id), and the
    stage output is byte-identical to an uninterrupted run."""
    import os
    import shutil

    df = _unit_df2(spark, range(8))
    ln.commit_partitioned(spark, out_dir, "run1", "s1", df)
    full = sorted(tuple(r) for r in ln.read_stage(spark, out_dir).collect())

    for u in (2, 5):
        shutil.rmtree(os.path.join(out_dir, "data", f"unit={u}"))
        os.remove(os.path.join(out_dir, "_lineage", f"s1_u{u}.parquet"))

    recs = ln.commit_partitioned(spark, out_dir, "run2", "s1", df)
    assert sorted(r["unit"] for r in recs) == [2, 5]
    lg = ln.read_lineage(spark, out_dir)
    assert lg.filter(F.col("run_id") == "run2").count() == 2
    assert lg.filter(F.col("run_id") == "run1").count() == 6
    again = sorted(tuple(r) for r in ln.read_stage(spark, out_dir).collect())
    assert again == full


def test_partitioned_recommit_checksum_stable(spark, out_dir):
    df = _unit_df2(spark, [3])
    a = ln.commit_partitioned(spark, out_dir, "r1", "s1", df)
    import os
    os.remove(os.path.join(out_dir, "_lineage", "s1_u3.parquet"))
    b = ln.commit_partitioned(spark, out_dir, "r2", "s1", df)
    assert a[0]["checksum"] == b[0]["checksum"]
    assert a[0]["row_count"] == b[0]["row_count"] == 100

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

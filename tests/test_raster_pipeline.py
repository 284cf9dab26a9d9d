"""Declarative raster pipeline runner (jobs/raster_pipeline.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

from raster_pipeline import run_raster_pipeline  # noqa: E402

TS = 16


@pytest.fixture
def tile_parquet(spark, tmp_path):
    rows = []
    for ty in range(2):
        for tx in range(2):
            a = ((np.arange(TS * TS, dtype=np.int64) * (tx + 2 * ty + 1))
                 % 200).astype(np.uint8)
            rows.append((tx, ty, bytearray(a.tobytes())))
    df = spark.createDataFrame(rows, "tx long, ty long, px binary")
    path = str(tmp_path / "tiles")
    df.write.mode("overwrite").parquet(path)
    return path


def test_calc_step_matches_direct(spark, tile_parquet):
    out = run_raster_pipeline(spark, [
        {"step": "read", "path": tile_parquet},
        {"step": "calc", "expr": "A * 2.0", "dtype": "uint8",
         "out_dtype": "float64", "tile_size": TS},
    ])
    from gdal_spark.operators.raster_calc import calc_tiles
    ref = calc_tiles({"A": spark.read.parquet(tile_parquet)}, "A * 2.0",
                     dtype="uint8", out_dtype="float64", tile_size=TS)
    got = {(r["tx"], r["ty"]): bytes(r["px"]) for r in out.collect()}
    want = {(r["tx"], r["ty"]): bytes(r["px"]) for r in ref.collect()}
    assert got == want and len(got) == 4


def test_hillshade_then_index(spark, tile_parquet):
    out = run_raster_pipeline(spark, [
        {"step": "read", "path": tile_parquet},
        {"step": "hillshade", "zoom": 1, "tile_size": TS, "dtype": "uint8"},
        {"step": "index", "zoom": 1,
         "grid": {"top_left_x": 0.0, "top_left_y": 32.0, "span": 32.0}},
    ])
    rows = {(r["tx"], r["ty"]): r for r in out.collect()}
    assert len(rows) == 4
    assert rows[(1, 1)]["location"] == "1/1/1"
    assert rows[(0, 0)]["xmin"] == 0.0 and rows[(0, 0)]["ymax"] == 32.0


def test_write_step_roundtrip(spark, tile_parquet, tmp_path):
    out_dir = str(tmp_path / "out")
    run_raster_pipeline(spark, [
        {"step": "read", "path": tile_parquet},
        {"step": "scale", "src_min": 0.0, "src_max": 200.0,
         "dst_min": 0.0, "dst_max": 100.0, "tile_size": TS},
        {"step": "write", "path": out_dir},
    ])
    back = spark.read.parquet(out_dir)
    assert back.count() == 4


def test_unknown_step(spark, tile_parquet):
    with pytest.raises(ValueError, match="unknown step"):
        run_raster_pipeline(spark, [
            {"step": "read", "path": tile_parquet},
            {"step": "warp-to-mars"},
        ])


def test_clip_step(spark, tile_parquet):
    out = run_raster_pipeline(spark, [
        {"step": "read", "path": tile_parquet},
        {"step": "clip", "x0": 4, "y0": 4, "w": 8, "h": 8,
         "tile_size": TS},
    ])
    from gdal_spark.operators.raster_tile import translate_window
    ref = translate_window(spark.read.parquet(tile_parquet), 4, 4, 8, 8,
                           tile_size=TS)
    got = {(r["tx"], r["ty"]): bytes(r["px"]) for r in out.collect()}
    want = {(r["tx"], r["ty"]): bytes(r["px"]) for r in ref.collect()}
    assert got == want and got

"""Distributed single-granule GeoTIFF sink (write_geotiff_single).

Contract: the distributed strip-stage + header + pwrite placement
must reproduce, bit-exactly, the raster a serial writer would have
produced from the same array — including ragged edges, multi-band
planar layout, crop anchoring, sparse holes, and the BigTIFF
container — and its output must be scannable by BOTH readers
(whole-file and row-range split)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.kernels.tiff import read_geotiff, write_geotiff
from gdal_spark.sources.geotiff import (read_geotiff_tiles,
                                        read_geotiff_tiles_split,
                                        write_geotiff_single)

GT = (500.0, 2.5, 0.0, 4100.0, 0.0, -2.5)


def _tiles_of(spark, arr, tmp_path, name, **kw):
    p = tmp_path / name
    p.write_bytes(write_geotiff(arr, geotransform=GT, epsg=32633,
                                nodata=0.0, **kw))
    return read_geotiff_tiles(spark, str(p), tile_size=64)


def test_roundtrip_ragged_single_band(spark, tmp_path):
    rng = np.random.default_rng(7)
    arr = rng.integers(1, 60000, size=(213, 187), dtype=np.uint16)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    out = str(tmp_path / "out.tif")
    info = write_geotiff_single(tiles, out, tile_size=64)
    assert (info["w"], info["h"], info["bands"]) == (187, 213, 1)
    a2, gt, epsg, nodata = read_geotiff(open(out, "rb").read())
    assert (a2 == arr).all()
    assert gt == GT and epsg == 32633 and nodata == 0.0


def test_split_scan_reads_sink_output(spark, tmp_path):
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 2**31 - 1, size=(140, 300), dtype=np.int32)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    out = str(tmp_path / "out.tif")
    write_geotiff_single(tiles, out, tile_size=64)
    got = read_geotiff_tiles_split(spark, out, tile_size=64,
                                   target_split_bytes=64 * 1024)
    back = {(r["tx"], r["ty"]):
            np.frombuffer(r["px"], dtype=np.dtype(r["dtype"]))
            .reshape(r["h"], r["w"]) for r in got.collect()}
    for (tx, ty), t in back.items():
        assert (t == arr[ty * 64:(ty + 1) * 64,
                         tx * 64:(tx + 1) * 64]).all()


def test_multiband_planar(spark, tmp_path):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, size=(130, 90, 3), dtype=np.uint8)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    out = str(tmp_path / "out.tif")
    info = write_geotiff_single(tiles, out, tile_size=64)
    assert info["bands"] == 3
    a2, gt, epsg, _ = read_geotiff(open(out, "rb").read())
    assert a2.shape == (130, 90, 3)
    assert (a2 == arr).all() and gt == GT and epsg == 32633


def test_crop_anchoring(spark, tmp_path):
    rng = np.random.default_rng(10)
    arr = rng.integers(1, 1000, size=(192, 256), dtype=np.uint16)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    from pyspark.sql import functions as F
    crop = tiles.filter((F.col("tx") >= 1) & (F.col("ty") >= 2))
    out = str(tmp_path / "out.tif")
    info = write_geotiff_single(crop, out, tile_size=64)
    assert (info["w"], info["h"]) == (256 - 64, 192 - 128)
    a2, gt, _, _ = read_geotiff(open(out, "rb").read())
    assert (a2 == arr[128:, 64:]).all()
    # origin shifted by the dropped tiles' ground extent
    assert gt == (GT[0] + 64 * GT[1], GT[1], 0.0,
                  GT[3] + 128 * GT[5], 0.0, GT[5])


def test_sparse_hole_zero_filled(spark, tmp_path):
    arr = np.full((128, 128), 7, dtype=np.uint8)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    from pyspark.sql import functions as F
    holey = tiles.filter(~((F.col("tx") == 1) & (F.col("ty") == 0)))
    out = str(tmp_path / "out.tif")
    write_geotiff_single(holey, out, tile_size=64)
    a2, _, _, _ = read_geotiff(open(out, "rb").read())
    want = arr.copy()
    want[0:64, 64:128] = 0
    assert (a2 == want).all()


def test_whole_missing_strip_band(spark, tmp_path):
    arr = np.full((192, 64), 9, dtype=np.uint8)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    from pyspark.sql import functions as F
    # middle strip band entirely absent -> driver zero-fill path
    holey = tiles.filter(F.col("ty") != 1)
    out = str(tmp_path / "out.tif")
    info = write_geotiff_single(holey, out, tile_size=64)
    assert info["n_strips"] == 3
    a2, _, _, _ = read_geotiff(open(out, "rb").read())
    want = arr.copy()
    want[64:128] = 0
    assert (a2 == want).all()


@pytest.mark.parametrize("compression", [None, "deflate"])
def test_bigtiff_and_raw(spark, tmp_path, compression):
    rng = np.random.default_rng(11)
    arr = rng.random((100, 130)).astype(np.float32)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    out = str(tmp_path / "out.tif")
    write_geotiff_single(tiles, out, tile_size=64,
                         compression=compression, bigtiff=True)
    blob = open(out, "rb").read()
    assert blob[:4] == b"II+\x00"          # BigTIFF magic 43
    a2, gt, _, _ = read_geotiff(blob)
    assert (a2 == arr).all() and gt == GT


def test_lineage_resume_exact(spark, tmp_path):
    """Exact resume: a strip whose lineage record exists is NOT
    re-placed (its corrupted bytes stay corrupted — proving the skip),
    a strip whose record was lost IS recomputed and re-placed."""
    import glob
    import os

    rng = np.random.default_rng(12)
    arr = rng.integers(1, 250, size=(192, 64), dtype=np.uint8)
    tiles = _tiles_of(spark, arr, tmp_path, "in.tif")
    out = str(tmp_path / "out.tif")
    ldir = str(tmp_path / "lin")
    info = write_geotiff_single(tiles, out, tile_size=64,
                                compression=None, lineage_dir=ldir)
    assert info["n_strips"] == 3
    recs = sorted(glob.glob(os.path.join(ldir, "_lineage", "*.parquet")))
    assert len(recs) == 3
    a1, _, _, _ = read_geotiff(open(out, "rb").read())
    assert (a1 == arr).all()

    # simulate a crash: strip s1's lineage record lost (uncommitted),
    # strip s2 committed; corrupt BOTH strips' bytes in the file
    from gdal_spark.kernels.tiff import tiff_meta
    with open(out, "rb") as fh:
        m = tiff_meta(fh)
    lost = [p for p in recs if "_s1" in p]
    assert len(lost) == 1
    os.unlink(lost[0])
    with open(out, "r+b") as fh:
        for si in (1, 2):
            fh.seek(m.offsets[si])
            fh.write(b"\xee" * m.counts[si])

    write_geotiff_single(tiles, out, tile_size=64,
                         compression=None, lineage_dir=ldir)
    a2, _, _, _ = read_geotiff(open(out, "rb").read())
    # s1 (uncommitted) was recomputed and fixed
    assert (a2[64:128] == arr[64:128]).all()
    # s0 untouched and still right
    assert (a2[0:64] == arr[0:64]).all()
    # s2 (committed) was SKIPPED — still corrupted: resume recomputes
    # exactly the uncommitted units, nothing else
    assert (a2[128:192] == 0xEE).all()
    # and its lineage record survives; s1's was re-appended
    recs2 = sorted(glob.glob(os.path.join(ldir, "_lineage",
                                          "*.parquet")))
    assert len(recs2) == 3

"""nearblack: distributed two-pass collar removal vs the serial
transcription of apps/nearblack_lib.cpp."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gdal_spark.kernels.nearblack import nearblack


def _image(h=64, w=64, seed=7, white=False):
    """Deterministic image with a ragged near-black collar, interior
    speckle, and a corridor reaching the interior."""
    rng = np.random.RandomState(seed)
    a = rng.randint(40, 220, size=(h, w)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    collar = (8 + (np.sin(xx / 5.0) * 4).astype(int))
    near = rng.randint(0, 12, size=(h, w)).astype(np.uint8)
    m = (yy < collar) | (yy >= h - collar) | (xx < collar) | (xx >= w - collar)
    # corridor of near-black from the left edge into the interior
    m |= (yy == h // 2) & (xx < w - 10)
    # interior noise specks (crossable when max_non_black > 0)
    a[collar[0] + 1, 3] = 200
    a[5, collar[0] + 1] = 200
    out = np.where(m, near, a).astype(np.uint8)
    if white:
        out = (255 - out).astype(np.uint8)
    return out


def _tiles_df(spark, img, tile_size):
    h, w = img.shape
    rows = []
    for ty in range(h // tile_size):
        for tx in range(w // tile_size):
            rows.append({"tx": tx, "ty": ty,
                         "px": img[ty * tile_size:(ty + 1) * tile_size,
                                   tx * tile_size:(tx + 1) * tile_size]
                         .tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.mark.parametrize("mnb,near,white,tile", [
    (0, 15, False, 16),
    (2, 15, False, 16),
    (2, 15, False, 32),
    (3, 40, False, 16),
    (0, 15, True, 16),
    (2, 15, True, 32),
])
def test_distributed_matches_serial(spark, mnb, near, white, tile):
    from gdal_spark.operators.nearblack import nearblack_tiles

    img = _image(64, 64, white=white)
    out_s, mask_s, _ = nearblack(img, near_dist=near,
                                 max_non_black=mnb, white=white)
    got = nearblack_tiles(
        _tiles_df(spark, img, tile), ntx=64 // tile, nty=64 // tile,
        tile_size=tile, near_dist=near, max_non_black=mnb,
        white=white).collect()
    out_d = np.zeros_like(img)
    mask_d = np.zeros_like(img)
    for r in got:
        t = np.frombuffer(r["px"], dtype=np.uint8).reshape(tile, tile)
        m = np.frombuffer(r["mask"], dtype=np.uint8).reshape(tile, tile)
        out_d[r["ty"] * tile:(r["ty"] + 1) * tile,
              r["tx"] * tile:(r["tx"] + 1) * tile] = t
        mask_d[r["ty"] * tile:(r["ty"] + 1) * tile,
               r["tx"] * tile:(r["tx"] + 1) * tile] = m
    assert np.array_equal(out_s, out_d)
    assert np.array_equal(mask_s, mask_d)


def test_serial_semantics_basics():
    """Collar goes to target, interior survives, corridor floods."""
    img = _image(64, 64)
    out, mask, black = nearblack(img, near_dist=15, max_non_black=0)
    # corners are collar -> blackened
    assert black[0, 0] and black[-1, -1]
    # interior bright pixels survive
    assert not black[32, 40] or img[32, 40] <= 15
    # the corridor row floods inward well past the collar
    assert black[32, 20]
    # blackened pixels are exactly 0 and masked
    assert (out[black] == 0).all() and (mask[black] == 0).all()
    assert (mask[~black] == 255).all()


def test_max_non_black_crosses_specks():
    """max_non_black=2 lets the sweep cross 1-px noise; 0 stops it."""
    img = np.full((8, 16), 5, dtype=np.uint8)
    img[4, :] = 200          # bright row blocks vertical continuation
    img[:, 8] = 200          # bright column splits rows
    img[4, 8] = 5
    _, _, b0 = nearblack(img, near_dist=15, max_non_black=0)
    _, _, b2 = nearblack(img, near_dist=15, max_non_black=2)
    assert b2.sum() >= b0.sum()
    assert not b0[4, 2]      # bright pixel never blackened vertically...
    # ...but horizontal sweep with max>0 can cross/consume specks
    assert b2[0, 0] and b0[0, 0]


def test_white_variant():
    img = _image(64, 64, white=True)
    out, mask, black = nearblack(img, near_dist=15, max_non_black=0,
                                 white=True)
    assert black[0, 0]
    assert (out[black] == 255).all()


@pytest.mark.parametrize("chunk", [1, 2, 3, 64])
def test_segmented_scan_chunking_matches_serial(spark, chunk):
    """The two-level segmented scan is invariant to chunk size: 8
    strips folded in chunks of 1 (every strip is a chunk boundary),
    2, 3 (uneven last chunk) and 64 (single chunk) all bit-match the
    serial kernel."""
    from gdal_spark.operators.nearblack import nearblack_tiles

    tile = 8
    img = _image(64, 64)
    out_s, mask_s, _ = nearblack(img, near_dist=15, max_non_black=2)
    got = nearblack_tiles(
        _tiles_df(spark, img, tile), ntx=8, nty=8, tile_size=tile,
        near_dist=15, max_non_black=2, chunk=chunk).collect()
    out_d = np.zeros_like(img)
    mask_d = np.zeros_like(img)
    for r in got:
        t = np.frombuffer(r["px"], dtype=np.uint8).reshape(tile, tile)
        m = np.frombuffer(r["mask"], dtype=np.uint8).reshape(tile, tile)
        out_d[r["ty"] * tile:(r["ty"] + 1) * tile,
              r["tx"] * tile:(r["tx"] + 1) * tile] = t
        mask_d[r["ty"] * tile:(r["ty"] + 1) * tile,
               r["tx"] * tile:(r["tx"] + 1) * tile] = m
    assert np.array_equal(out_s, out_d)
    assert np.array_equal(mask_s, mask_d)

"""Median-cut + dither: kernel semantics and distributed parity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gdal_spark.kernels import quantize as kq


def _hist_of(rgb, n_bits=5):
    levels = 1 << n_bits
    shift = 8 - n_bits
    h = np.zeros((levels, levels, levels), dtype=np.int64)
    r = rgb[..., 0].ravel() >> shift
    g = rgb[..., 1].ravel() >> shift
    b = rgb[..., 2].ravel() >> shift
    np.add.at(h, (r, g, b), 1)
    return h


def test_median_cut_two_clusters():
    """Two well-separated clusters with n_colors=2 -> one box per
    cluster, palette at ((min+max)<<3)/2 of each occupied extent."""
    rgb = np.zeros((10, 10, 3), dtype=np.uint8)
    rgb[:, :5] = [16, 16, 16]          # cluster A -> 5-bit cell 2
    rgb[:, 5:] = [200, 200, 200]       # cluster B -> 5-bit cell 25
    pal = kq.median_cut(_hist_of(rgb), n_colors=2)
    assert len(pal) == 2
    got = {tuple(p) for p in pal.tolist()}
    assert got == {(16, 16, 16), (200, 200, 200)}


def test_median_cut_respects_color_budget():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
    pal = kq.median_cut(_hist_of(rgb), n_colors=16)
    assert 1 <= len(pal) <= 16


def test_find_nearest_first_wins_ties():
    pal = np.array([[10, 0, 0], [0, 0, 0], [10, 0, 0]], dtype=np.uint8)
    idx = kq.find_nearest(pal, np.array([10]), np.array([0]), np.array([0]))
    assert idx[0] == 0                 # strict <: first best index


def test_dither_exact_palette_color_is_stable():
    """Pixels that exactly match a palette entry produce zero error
    and map to that entry everywhere."""
    pal = np.array([[0, 0, 0], [100, 150, 200]], dtype=np.uint8)
    rgb = np.tile(np.array([100, 150, 200], dtype=np.uint8), (8, 8, 1))
    out = kq.dither(rgb, pal)
    assert (out == 1).all()


def test_dither_preserves_mean():
    """Error diffusion keeps the dithered mean near the input mean
    (the whole point of dithering a 2-color palette)."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    rgb = np.full((32, 32, 3), 96, dtype=np.uint8)
    out = kq.dither(rgb, pal)
    frac_white = (out == 1).mean()
    assert abs(frac_white - 96 / 255) < 0.08
    plain = kq.find_nearest(pal, rgb[..., 0], rgb[..., 1], rgb[..., 2])
    assert (plain == 0).all()          # nearest alone loses the signal


def test_distributed_palette_and_pct(spark):
    from gdal_spark.operators.quantize import median_cut_palette, rgb_to_pct

    ts, n = 16, 2
    rng = np.random.RandomState(3)
    full = rng.randint(0, 256, size=(n * ts, n * ts, 3)).astype(np.uint8)
    rows = []
    for ty in range(n):
        for tx in range(n):
            w = full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append({"tx": tx, "ty": ty,
                         "px_r": w[..., 0].tobytes(),
                         "px_g": w[..., 1].tobytes(),
                         "px_b": w[..., 2].tobytes()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))

    pal = median_cut_palette(tiles, n_colors=16, tile_size=ts)
    want_pal = kq.median_cut(_hist_of(full), n_colors=16)
    np.testing.assert_array_equal(pal, want_pal)

    out = {(r["tx"], r["ty"]): r for r in rgb_to_pct(
        tiles, pal, tile_size=ts, dither=True).collect()}
    for row in rows:
        w = full[row["ty"] * ts:(row["ty"] + 1) * ts,
                 row["tx"] * ts:(row["tx"] + 1) * ts]
        want = kq.dither(w, pal)
        got = np.frombuffer(out[(row["tx"], row["ty"])]["px"],
                            dtype=np.uint8).reshape(ts, ts)
        np.testing.assert_array_equal(got, want)


def test_pct_roundtrip_exact_palette(spark):
    """rgb2pct -> pct2rgb is identity when the image only contains
    palette colors."""
    from gdal_spark.operators.quantize import pct_to_rgb, rgb_to_pct

    ts = 16
    pal = np.array([[10, 20, 30], [200, 100, 50], [0, 0, 0]],
                   dtype=np.uint8)
    rng = np.random.RandomState(6)
    idx = rng.randint(0, 3, size=(ts, ts)).astype(np.uint8)
    rgb = pal[idx]
    tiles = spark.createDataFrame(pd.DataFrame([{
        "tx": 0, "ty": 0,
        "px_r": rgb[..., 0].tobytes(), "px_g": rgb[..., 1].tobytes(),
        "px_b": rgb[..., 2].tobytes()}]))
    pct = rgb_to_pct(tiles, pal, tile_size=ts, dither=False)
    back = pct_to_rgb(pct, pal, tile_size=ts).collect()
    got = {r["band"]: np.frombuffer(r["px"], np.uint8).reshape(ts, ts)
           for r in back}
    np.testing.assert_array_equal(got[1], rgb[..., 0])
    np.testing.assert_array_equal(got[2], rgb[..., 1])
    np.testing.assert_array_equal(got[3], rgb[..., 2])


def test_dither_halo_seam_quality(spark):
    """Quantifies seam deviation of the distributed dither vs the
    serial reference scan, with and without the halo-overlap pass
    (operators/quantize.py module docstring).  Error diffusion is
    chaotic, so the honest targets are: mismatch fraction shrinks
    with the halo, and the perceptual error matches serial."""
    from gdal_spark.operators.quantize import rgb_to_pct

    ts, tw, th = 32, 3, 2
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
    yy, xx = np.mgrid[0:th * ts, 0:tw * ts]
    img = np.stack([xx * 255 // (tw * ts - 1), yy * 255 // (th * ts - 1),
                    (xx + yy) % 256], axis=-1).astype(np.uint8)
    serial = kq.dither(img, pal)

    rows = []
    for ty in range(th):
        for tx in range(tw):
            t = img[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append({"tx": tx, "ty": ty,
                         "px_r": t[..., 0].tobytes(),
                         "px_g": t[..., 1].tobytes(),
                         "px_b": t[..., 2].tobytes()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))

    stats = {}
    for halo in (0, 16):
        out = rgb_to_pct(tiles, pal, tile_size=ts, dither=True,
                         halo=halo).collect()
        got = np.zeros_like(serial)
        assert len(out) == tw * th
        for r in out:
            got[r["ty"] * ts:(r["ty"] + 1) * ts,
                r["tx"] * ts:(r["tx"] + 1) * ts] = \
                np.frombuffer(r["px"], dtype=np.uint8).reshape(ts, ts)
        src = img.astype(np.int64)
        stats[halo] = {
            "mismatch": float((got != serial).mean()),
            "err": float(np.abs(pal[got].astype(np.int64) - src).mean()),
            "drift": float(np.abs(
                pal[got].astype(np.int64).mean(axis=(0, 1))
                - pal[serial].astype(np.int64).mean(axis=(0, 1))).max()),
        }
    err_serial = float(np.abs(pal[serial].astype(np.int64) - src).mean())

    # halo reduces per-pixel divergence from the serial scan
    assert stats[16]["mismatch"] < stats[0]["mismatch"]
    # both runs dither as well as the serial scan (perceptual parity)
    for h in (0, 16):
        assert abs(stats[h]["err"] - err_serial) < 0.5
    # mean output color tracks serial to a fraction of an intensity
    # level, tighter with the halo
    assert stats[16]["drift"] < 0.4
    assert stats[16]["drift"] <= stats[0]["drift"]


def test_dither_halo_single_tile_bit_exact(spark):
    """With one tile there are no seams: the halo path must still be
    bit-identical to the serial kernel (no neighbors arrive, the
    rectangle degenerates to the tile itself)."""
    from gdal_spark.operators.quantize import rgb_to_pct

    ts = 32
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(ts, ts, 3)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(6, 3)).astype(np.uint8)
    tiles = spark.createDataFrame(pd.DataFrame([{
        "tx": 0, "ty": 0,
        "px_r": img[..., 0].tobytes(),
        "px_g": img[..., 1].tobytes(),
        "px_b": img[..., 2].tobytes()}]))
    out = rgb_to_pct(tiles, pal, tile_size=ts, dither=True,
                     halo=8).collect()
    assert len(out) == 1
    got = np.frombuffer(out[0]["px"], dtype=np.uint8).reshape(ts, ts)
    np.testing.assert_array_equal(got, kq.dither(img, pal))

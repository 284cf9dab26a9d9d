"""Color quantization kernels: median-cut palette + dithering.

Faithful transcriptions of the reference:

* ``median_cut``: GDALComputeMedianCutPCTInternal
  (/root/reference/alg/gdalmediancut.cpp:266-570 dense-histogram
  path, nBits=5): one global box shrunk to the occupied extent, then
  repeated splits of the largest splittable box (strict > total, head
  of list wins ties, :573-590) along its longest axis (R >= G >= B
  preference, splitbox) at the cumulative-histogram median
  (first index where cumsum >= total/2, i==first bumped), both halves
  shrunk to occupancy; palette entry = ((min+max)<<shift)/2 with new
  boxes PUSHED AT THE LIST HEAD (:527-546).

* ``dither``: GDALDitherRGB2PCT (/root/reference/alg/gdaldither.cpp:
  395-560): strict left-to-right scan, per channel
  nSixth = nError / 6 (C TRUNCATING division), next-line carries
  (i-1 += sixth, i+1 = sixth, i += error - 5*sixth) and same-line
  carry 2*sixth; values clamped to [0,255] before the nearest-color
  lookup — MANHATTAN distance |dr|+|dg|+|db| with strict < so the
  first best index wins (FindNearestColor :665-684, the scalar twin
  of the SSE _mm_sad_epu8 path).
"""

from __future__ import annotations

import numpy as np


def _trunc_div6(e: int) -> int:
    """C integer division truncates toward zero; Python // floors."""
    return -((-e) // 6) if e < 0 else e // 6


def median_cut(hist: np.ndarray, n_colors: int = 256,
               n_bits: int = 5) -> np.ndarray:
    """hist: dense (L, L, L) counts with L = 1 << n_bits (indices are
    channel >> (8 - n_bits)).  Returns (<= n_colors, 3) uint8 RGB."""
    levels = 1 << n_bits
    shift = 8 - n_bits
    assert hist.shape == (levels, levels, levels)
    occ = np.argwhere(hist > 0)
    if len(occ) == 0:
        return np.zeros((0, 3), dtype=np.uint8)

    # box = [rmin, rmax, gmin, gmax, bmin, bmax, total]
    first = [int(occ[:, 0].min()), int(occ[:, 0].max()),
             int(occ[:, 1].min()), int(occ[:, 1].max()),
             int(occ[:, 2].min()), int(occ[:, 2].max()),
             int(hist.sum())]
    boxes = [first]                      # index 0 == list head

    def shrink(box):
        sub = hist[box[0]:box[1] + 1, box[2]:box[3] + 1, box[4]:box[5] + 1]
        nz = np.argwhere(sub > 0)
        if len(nz) == 0:
            return
        box[0], box[1] = box[0] + int(nz[:, 0].min()), box[0] + int(nz[:, 0].max())
        g0 = box[2]
        box[2], box[3] = g0 + int(nz[:, 1].min()), g0 + int(nz[:, 1].max())
        b0 = box[4]
        box[4], box[5] = b0 + int(nz[:, 2].min()), b0 + int(nz[:, 2].max())

    while len(boxes) < n_colors:
        # largest_box: max total among boxes with extent; strict >
        # means the earliest (head-most) box wins ties
        best = None
        for b in boxes:
            if (b[1] > b[0] or b[3] > b[2] or b[5] > b[4]) and (
                    best is None or b[6] > best[6]):
                best = b
        if best is None:
            break
        ptr = best
        dr, dg, db = ptr[1] - ptr[0], ptr[3] - ptr[2], ptr[5] - ptr[4]
        if dr >= dg and dr >= db:
            axis, lo, hi = 0, ptr[0], ptr[1]
        elif dg >= db:
            axis, lo, hi = 1, ptr[2], ptr[3]
        else:
            axis, lo, hi = 2, ptr[4], ptr[5]
        sub = hist[ptr[0]:ptr[1] + 1, ptr[2]:ptr[3] + 1, ptr[4]:ptr[5] + 1]
        h2 = sub.sum(axis=tuple(a for a in (0, 1, 2) if a != axis))
        # first index where cumsum >= total/2 (integer half)
        half = ptr[6] // 2
        cum = 0
        i = lo
        for k, v in enumerate(h2):
            cum += int(v)
            if cum >= half:
                i = lo + k
                break
        else:
            i = hi
        if i == lo:
            i += 1
        sum1 = int(h2[:i - lo].sum())
        sum2 = int(h2[i - lo:].sum())
        new_cb = list(ptr)
        new_cb[6] = sum1
        ptr[6] = sum2
        new_cb[2 * axis + 1] = i - 1       # new box: [lo, i-1]
        ptr[2 * axis] = i                  # old box: [i, hi]
        shrink(new_cb)
        shrink(ptr)
        boxes.insert(0, new_cb)            # push at head

    pal = np.array(
        [[((b[0] + b[1]) << shift) // 2,
          ((b[2] + b[3]) << shift) // 2,
          ((b[4] + b[5]) << shift) // 2] for b in boxes],
        dtype=np.uint8)
    return pal


def find_nearest(palette: np.ndarray, r, g, b):
    """argmin of MANHATTAN RGB distance (|dr|+|dg|+|db|, the metric
    of FindNearestColor, gdaldither.cpp:665-684); numpy argmin
    returns the FIRST minimum, matching the strict <."""
    pr = palette[:, 0].astype(np.int64)
    pg = palette[:, 1].astype(np.int64)
    pb = palette[:, 2].astype(np.int64)
    r = np.asarray(r, dtype=np.int64)[..., None]
    g = np.asarray(g, dtype=np.int64)[..., None]
    b = np.asarray(b, dtype=np.int64)[..., None]
    d = np.abs(r - pr) + np.abs(g - pg) + np.abs(b - pb)
    return np.argmin(d, axis=-1).astype(np.uint8)


def dither(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """rgb: (H, W, 3) uint8 -> (H, W) uint8 palette indices with the
    reference's error diffusion.  Strictly serial scan (the reference
    is too); the operator distributes ACROSS tiles."""
    h_rows, w_cols = rgb.shape[:2]
    out = np.zeros((h_rows, w_cols), dtype=np.uint8)
    pal = palette.astype(np.int64)
    cache: dict = {}                     # exact-color memo, the role of
    # the reference's ColorIndex hashmap (gdaldither.cpp:84-96)
    nxt = [0] * ((w_cols + 2) * 3)       # next-line error, +1 px offset
    for y in range(h_rows):
        err_line, nxt = nxt, [0] * ((w_cols + 2) * 3)
        last = [0, 0, 0]
        row = rgb[y].tolist()
        for x in range(w_cols):
            vals = [0, 0, 0]
            for c in range(3):
                # the reference applies the next-line error in a
                # pre-pass with its own clamp (gdaldither.cpp:384-392)
                # and the same-line carry with a second clamp (:409)
                v = row[x][c] + err_line[(x + 1) * 3 + c]
                v = 0 if v < 0 else (255 if v > 255 else v)
                v = v + last[c]
                vals[c] = 0 if v < 0 else (255 if v > 255 else v)
            key = (vals[0] << 16) | (vals[1] << 8) | vals[2]
            idx = cache.get(key)
            if idx is None:
                d = (np.abs(pal[:, 0] - vals[0])
                     + np.abs(pal[:, 1] - vals[1])
                     + np.abs(pal[:, 2] - vals[2]))
                idx = int(np.argmin(d))
                cache[key] = idx
            out[y, x] = idx
            for c in range(3):
                e = vals[c] - int(pal[idx, c])
                sixth = _trunc_div6(e)
                nxt[x * 3 + c] += sixth              # next line, x-1
                nxt[(x + 2) * 3 + c] = sixth         # next line, x+1
                nxt[(x + 1) * 3 + c] += e - 5 * sixth
                last[c] = 2 * sixth
    return out

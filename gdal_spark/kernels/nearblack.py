"""Serial nearblack kernel — faithful transcription of the reference
two-passes algorithm (/root/reference/apps/nearblack_lib.cpp:360-745,
GDALNearblackTwoPassesAlgorithm + ProcessLine).

Semantics: scan top-down then bottom-up; per line run a vertical
check (per-column saturating non-black counts carried line to line)
then two horizontal sweeps (left->right over columns [0, W-2],
right->left over [W-1, 1]).  Pixels within ``near_dist`` of the
target color (black or white) that are reachable from the collar are
replaced by the exact target and masked 0.  ``max_non_black`` lets
up to that many noise pixels be crossed (forced to 0 on the
bottom-up pass, nearblack_lib.cpp:647).

Key invariant exploited by the distributed operator
(operators/nearblack.py): with a single target color, blackening
maps near pixels to the exact target, which stays near — so the
non-near classification of every pixel is identical in both passes
and both horizontal sweeps.  The whole algorithm is a deterministic
function of one boolean non-near matrix, which is what makes the
per-strip parallel-prefix decomposition exact.
"""

from __future__ import annotations

import numpy as np


def _nonnear_matrix(img: np.ndarray, near_dist: int,
                    white: bool) -> np.ndarray:
    """(H, W) bool: pixel fails the near test for the target color.

    Mirrors the per-band loop at nearblack_lib.cpp:588-596: non-near
    iff any band has |color - pix| > near_dist (color is 0 or 255 on
    every band).
    """
    if img.ndim == 2:
        img = img[:, :, None]
    color = 255 if white else 0
    px = img.astype(np.int64)
    bad = (color - px > near_dist) | (px > near_dist + color)
    return bad.any(axis=2)


def _process_line(nonnear_row: np.ndarray, counts: np.ndarray,
                  max_non_black: int, bottom_up: bool,
                  line_from_edge: int) -> np.ndarray:
    """One ProcessLine round: vertical check + both horizontal sweeps.

    Mutates ``counts`` (the panLastLineCounts recurrence) and returns
    the (W,) bool blacken decision for this line.  Transcribes
    nearblack_lib.cpp:545-745 exactly, operating on the non-near
    classification (valid by the invariant in the module docstring).
    """
    w = nonnear_row.shape[0]
    blacken = np.zeros(w, dtype=bool)

    # ---- vertical check (nearblack_lib.cpp:562-634) ----
    start_active = counts <= max_non_black
    nn = nonnear_row
    inc = start_active & nn
    counts[inc] += 1
    vb = start_active & ~(nn & (counts > max_non_black))
    if line_from_edge == 0 and max_non_black > 0:
        # valid value right at the raster edge: ignore max_non_black
        # for that column (nearblack_lib.cpp:611-616)
        vb &= ~nn
        counts[inc] = max_non_black + 1
    blacken |= vb

    # ---- horizontal sweeps (nearblack_lib.cpp:640-745) ----
    h_max = 0 if bottom_up else max_non_black
    for i_start, i_end, step in ((0, w - 1, 1), (w - 1, 0, -1)):
        do_test = True
        non_black = 0
        for i in range(i_start, i_end, step):
            if do_test:
                if nn[i]:
                    if counts[i] <= h_max:
                        non_black = int(counts[i])
                    else:
                        non_black += 1
                if non_black > h_max:
                    do_test = False
                    continue
                if nn[i] and h_max > 0 and i == i_start:
                    do_test = False
                    continue
                blacken[i] = True
            elif counts[i] == 0:
                do_test = True
                non_black = 0
    return blacken


def nearblack(img: np.ndarray, near_dist: int = 15,
              max_non_black: int = 2, white: bool = False):
    """Run the full two-pass algorithm on a (H, W) or (H, W, B) uint8
    image.  Returns (out_img, mask, blackened) where mask is 255/0
    (nearblack -setmask) and blackened the union bool matrix.
    """
    squeeze = img.ndim == 2
    a = img[:, :, None] if squeeze else img
    h, w, _ = a.shape
    nonnear = _nonnear_matrix(a, near_dist, white)
    target = 255 if white else 0

    blackened = np.zeros((h, w), dtype=bool)
    # pass 1: top-down (nearblack_lib.cpp:397-465)
    counts = np.zeros(w, dtype=np.int64)
    for y in range(h):
        blackened[y] |= _process_line(
            nonnear[y], counts, max_non_black, False, y)
    # pass 2: bottom-up on pass-1 output; classification is invariant
    # so the same nonnear matrix applies (nearblack_lib.cpp:471-507)
    counts = np.zeros(w, dtype=np.int64)
    for y in range(h - 1, -1, -1):
        blackened[y] |= _process_line(
            nonnear[y], counts, max_non_black, True, h - 1 - y)

    out = a.copy()
    out[blackened] = target
    mask = np.where(blackened, 0, 255).astype(np.uint8)
    if squeeze:
        out = out[:, :, 0]
    return out, mask, blackened


def strip_transitions(nonnear: np.ndarray, max_non_black: int,
                      bottom_up: bool, edge_strip: bool) -> np.ndarray:
    """Per-column state-transition table for one full-width row strip.

    The vertical count recurrence saturates at max_non_black + 1
    (frozen once above max, nearblack_lib.cpp:569), so the per-column
    state lives in {0..max+1}.  For each possible incoming state s
    this returns the outgoing state after the strip's rows — shape
    (max+2, W) uint8.  Strip tables compose associatively, giving a
    parallel-prefix scan over strips.

    ``edge_strip``: this strip contains the raster edge row for the
    scan direction (row 0 top-down / last row bottom-up), where the
    max_non_black>0 special rule applies.
    """
    h, w = nonnear.shape
    rows = range(h - 1, -1, -1) if bottom_up else range(h)
    n_states = max_non_black + 2
    out = np.empty((n_states, w), dtype=np.uint8)
    for s in range(n_states):
        counts = np.full(w, s, dtype=np.int64)
        for k, y in enumerate(rows):
            active = counts <= max_non_black
            inc = active & nonnear[y]
            counts[inc] += 1
            if k == 0 and edge_strip and max_non_black > 0 and s == 0:
                counts[inc] = max_non_black + 1
        out[s] = counts.astype(np.uint8)
    return out


def compose_states(state: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Apply a strip transition table to an incoming state vector."""
    return trans[state, np.arange(state.shape[0])]


def strip_blacken(nonnear: np.ndarray, in_counts: np.ndarray,
                  max_non_black: int, bottom_up: bool,
                  rows_from_edge0: int) -> np.ndarray:
    """Blacken decisions for one strip given its incoming per-column
    counts (from the prefix scan).  ``rows_from_edge0`` is the
    distance of the strip's first processed row from the raster edge
    in scan order (0 only for the edge strip).
    """
    h, w = nonnear.shape
    rows = range(h - 1, -1, -1) if bottom_up else range(h)
    counts = in_counts.astype(np.int64).copy()
    blacken = np.zeros((h, w), dtype=bool)
    for k, y in enumerate(rows):
        blacken[y] = _process_line(
            nonnear[y], counts, max_non_black, bottom_up,
            rows_from_edge0 + k)
    return blacken


def compose_tables(first: np.ndarray, then: np.ndarray) -> np.ndarray:
    """Compose two strip transition tables: the result maps an
    incoming state through ``first`` then ``then`` per column.
    Associative — the scan over strips is a parallel prefix."""
    return np.take_along_axis(then, first, axis=0)

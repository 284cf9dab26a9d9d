"""Sieve filter kernel: remove connected components smaller than a
threshold by merging them into their largest neighbor.

Semantics target: GDALSieveFilter
(/root/reference/alg/gdalsievefilter.cpp:178): polygons (equal-value
connected components, 4- or 8-conn) with pixel count < threshold are
absorbed by a neighboring polygon; we deterministically pick the
neighbor with the largest CURRENT size (ties -> smallest component
id) and iterate simultaneous rounds to fixpoint.  This is
semantics-equivalent (small blobs vanish into dominant neighbors),
not a replay of GDAL's sequential merge order; the distributed
operator reproduces THIS kernel exactly (tile-split invariance).
"""

from __future__ import annotations

import numpy as np

from .polygonize import label_components


def _adjacency(labels):
    """Set of (comp_a, comp_b) 4-adjacent pairs, a != b, both > 0."""
    pairs = set()
    h, w = labels.shape
    a = labels[:, :-1].ravel()
    b = labels[:, 1:].ravel()
    for x, y in zip(a.tolist(), b.tolist()):
        if x and y and x != y:
            pairs.add((x, y))
            pairs.add((y, x))
    a = labels[:-1, :].ravel()
    b = labels[1:, :].ravel()
    for x, y in zip(a.tolist(), b.tolist()):
        if x and y and x != y:
            pairs.add((x, y))
            pairs.add((y, x))
    return pairs


def sieve_array(arr, threshold: int, connect8: bool = False, nodata=None):
    """Returns the sieved value array (same shape/dtype as input)."""
    a = np.asarray(arr).copy()
    for _ in range(64):
        labels, n = label_components(a, connect8=connect8, nodata=nodata)
        if n == 0:
            break
        sizes = np.bincount(labels.ravel(), minlength=n + 1)
        small = {c for c in range(1, n + 1) if sizes[c] < threshold}
        if not small:
            break
        adj = _adjacency(labels)
        nbrs: dict[int, list[int]] = {}
        for x, y in adj:
            nbrs.setdefault(x, []).append(y)
        merged = False
        # simultaneous round: every small comp adopts the value of its
        # largest neighbor (size desc, id asc)
        new_val = {}
        for c in small:
            cand = nbrs.get(c, [])
            if not cand:
                continue
            tgt = min(cand, key=lambda t: (-sizes[t], t))
            new_val[c] = tgt
            merged = True
        if not merged:
            break
        val_of = {}
        ys, xs = np.nonzero(labels > 0)
        for yy, xx in zip(ys.tolist(), xs.tolist()):
            val_of.setdefault(labels[yy, xx], a[yy, xx])
        out = a.copy()
        for c, tgt in new_val.items():
            out[labels == c] = val_of[tgt]
        a = out
    return a

"""Distributed polygonize: tiles -> polygons, tile-split invariant.

The reference polygonizes a raster in one pass with a streaming
two-row enumerator (/root/reference/alg/polygonize.cpp:500,
/root/reference/alg/gdalrasterpolygonenumerator.cpp:75).  A 10^12-
pixel raster doesn't fit one pass, so the operator distributes it:

  1. per tile (applyInPandas): CC-label equal-valued pixels
     (kernels.polygonize.label_components), emit compressed row runs
     keyed by a packed (tile, local-label) node id;
  2. cross-tile equivalence: border pixels re-derived from runs with
     JVM-side explodes, joined left|right and top|bottom on (global
     coordinate, value) — one shuffle keyed by the border line;
  3. global labels: iterative min-label propagation over the
     equivalence edges to fixpoint (the distributed union-find;
     O(diameter-of-tile-graph) rounds, each a join+groupBy);
  4. per component (applyInPandas after regrouping runs by final
     label): rebuild the mask in the component bbox, trace boundary
     rings (kernels.polygonize.trace_rings), emit WKB polygon +
     value + pixel count.

Memory note: step 4 materializes one component's bbox; pathological
components spanning the whole raster need hierarchical ring merge
(future work, noted in SURVEY §7 'hardest distributed piece').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels import polygonize as kpoly
from ..kernels import wkb as kwkb

RUNS_SCHEMA = "node long, value long, gy long, gx0 long, gx1 long"
POLY_SCHEMA = "comp long, value long, pixel_count long, n_rings int, wkb binary"

# node id packing: (tx << 40) | (ty << 20) | local_label
_TY_SHIFT = 20
_TX_SHIFT = 40


def tile_runs(tiles: DataFrame, dtype: str = "uint8", tile_size: int = 256,
              connect8: bool = False, nodata=0) -> DataFrame:
    """Step 1: per-tile labeling -> global-coordinate row runs."""
    np_dtype = np.dtype(dtype)
    ts = tile_size

    def _label(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        arr = np.frombuffer(pdf.iloc[0]["px"], dtype=np_dtype).reshape(ts, ts)
        labels, _ = kpoly.label_components(arr, connect8=connect8, nodata=nodata)
        rows = []
        base = (tx << _TX_SHIFT) | (ty << _TY_SHIFT)
        for lab, y, x0, x1 in kpoly.runs_of_labels(labels):
            rows.append((base | lab, int(arr[y, x0]), ty * ts + y,
                         tx * ts + x0, tx * ts + x1))
        return pd.DataFrame(rows, columns=["node", "value", "gy", "gx0", "gx1"])

    return tiles.groupBy("tx", "ty").applyInPandas(_label, RUNS_SCHEMA)


def _border_pixels(runs: DataFrame, tile_size: int) -> DataFrame:
    """Per-pixel rows for run cells on any tile border (JVM explode)."""
    ts = tile_size
    on_row_border = (F.col("gy") % ts == 0) | (F.col("gy") % ts == ts - 1)
    px = runs.withColumn(
        "gx",
        F.explode(
            F.when(on_row_border, F.sequence(F.col("gx0"), F.col("gx1")))
            .otherwise(F.array_remove(F.array(
                F.when(F.col("gx0") % ts == 0, F.col("gx0")).otherwise(F.lit(-1)),
                F.when(F.col("gx1") % ts == ts - 1, F.col("gx1")).otherwise(F.lit(-1)),
            ), -1))
        ),
    )
    return px.select("node", "value", "gy", "gx")


def equivalence_edges(runs: DataFrame, tile_size: int = 256,
                      connect8: bool = False) -> DataFrame:
    """Step 2: (node_a, node_b) pairs whose pixels touch across a tile
    border with equal value."""
    ts = tile_size
    px = _border_pixels(runs, ts)

    def adj(dx, dy):
        # equi-join on the SHIFTED coordinate so Catalyst plans a hash
        # join keyed by (coordinate, value) — never a nested loop
        a = px.select(
            (F.col("gx") + dx).alias("jx"), (F.col("gy") + dy).alias("jy"),
            F.col("value").alias("jv"), F.col("node").alias("n_a"))
        b = px.select(
            F.col("gx").alias("jx"), F.col("gy").alias("jy"),
            F.col("value").alias("jv"), F.col("node").alias("n_b"))
        return (
            a.join(b, ["jx", "jy", "jv"])
            .filter(F.col("n_a") != F.col("n_b"))   # cross-tile contacts only
            .select("n_a", "n_b")
        )

    # right neighbor across a vertical border; down neighbor across a
    # horizontal border
    right = adj(1, 0)
    down = adj(0, 1)
    edges = right.unionByName(down)
    if connect8:
        edges = edges.unionByName(adj(1, 1)).unionByName(adj(-1, 1))
    return edges.distinct()


def global_labels(runs: DataFrame, edges: DataFrame,
                  max_rounds: int = 64,
                  driver_threshold: int = 2_000_000) -> DataFrame:
    """Step 3: (node, comp) with comp = min node id in the connected
    node cluster.

    Strategy choice mirrors broadcast-vs-shuffle joins: below
    ``driver_threshold`` edges the union-find runs on the driver
    (O(E α), one collect + one createDataFrame); above it, the
    distributed min-propagation with pointer jumping (O(log diameter)
    rounds, each fully parallel) takes over.
    """
    spark = runs.sparkSession
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        nodes = [r["node"] for r in runs.select("node").distinct().collect()]
        parent = {n: n for n in nodes}

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for r in edges.collect():
            a, b = find(r["n_a"]), find(r["n_b"])
            if a != b:
                if a < b:
                    parent[b] = a
                else:
                    parent[a] = b
        rows = [(n, find(n)) for n in nodes]
        return spark.createDataFrame(rows, "node long, comp long")

    comp = runs.select("node").distinct().withColumn("comp", F.col("node"))
    sym = edges.unionByName(
        edges.select(F.col("n_b").alias("n_a"), F.col("n_a").alias("n_b"))
    ).distinct()
    # localCheckpoint truncates lineage: without it the iterative plan
    # grows superlinearly and the driver OOMs just printing it
    sym = sym.localCheckpoint(eager=True)
    comp = comp.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nb_min = (
            sym.join(comp, F.col("n_b") == F.col("node"))
            .groupBy("n_a").agg(F.min("comp").alias("nb_comp"))
        )
        new = (
            comp.join(nb_min, comp.node == nb_min.n_a, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"),
                    F.coalesce(F.col("nb_comp"), F.col("comp")),
                ).alias("comp"),
            )
        )
        # pointer jumping (comp := comp[comp]) turns the O(diameter)
        # min-propagation into O(log diameter) rounds — long chains
        # (contour polylines) would otherwise exhaust max_rounds
        m = new.select(F.col("node").alias("jnode"),
                       F.col("comp").alias("jcomp"))
        new = (
            new.join(m, new.comp == m.jnode, "left")
            .select("node",
                    F.least(F.col("comp"),
                            F.coalesce(F.col("jcomp"), F.col("comp")))
                    .alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(comp.withColumnRenamed("comp", "_old"), "node")
            .filter(F.col("comp") != F.col("_old")).count()
        )
        comp = new
        if changed == 0:
            break
    return comp


def assemble_polygons(runs: DataFrame, comp: DataFrame,
                      connect8: bool = False,
                      geotransform=None) -> DataFrame:
    """Step 4: regroup runs by final component, trace rings, emit WKB.

    geotransform (x0, resx, 0, y0, 0, -resy) maps global pixel coords
    to world coords; None emits pixel-corner coordinates.
    """
    labeled = runs.join(comp, "node")

    def _trace(key, pdf: pd.DataFrame) -> pd.DataFrame:
        comp_id = int(key[0])
        gy = pdf["gy"].to_numpy()
        gx0 = pdf["gx0"].to_numpy()
        gx1 = pdf["gx1"].to_numpy()
        y0, y1 = int(gy.min()), int(gy.max())
        x0, x1 = int(gx0.min()), int(gx1.max())
        mask = np.zeros((y1 - y0 + 1, x1 - x0 + 2), dtype=bool)
        for y, a, b in zip(gy, gx0, gx1):
            mask[y - y0, a - x0:b - x0 + 1] = True
        rings = kpoly.trace_rings(mask, connect8=connect8)
        world = []
        for r in rings:
            w = r.copy()
            w[:, 0] += x0
            w[:, 1] += y0
            if geotransform is not None:
                ox, rx, _, oy, _, nry = geotransform
                w = np.column_stack([ox + w[:, 0] * rx, oy + w[:, 1] * nry])
            world.append(w)
        n_px = int((gx1 - gx0 + 1).sum())
        return pd.DataFrame({
            "comp": [comp_id],
            "value": [int(pdf.iloc[0]["value"])],
            "pixel_count": [n_px],
            "n_rings": [len(world)],
            "wkb": [kwkb.wkb_polygon(world)],
        })

    return labeled.groupBy("comp").applyInPandas(_trace, POLY_SCHEMA)


def polygonize_tiles(tiles: DataFrame, dtype: str = "uint8",
                     tile_size: int = 256, connect8: bool = False,
                     nodata=0, geotransform=None) -> DataFrame:
    """Full distributed polygonize (steps 1-4)."""
    runs = tile_runs(tiles, dtype, tile_size, connect8, nodata)
    runs = runs.cache()
    edges = equivalence_edges(runs, tile_size, connect8)
    comp = global_labels(runs, edges)
    return assemble_polygons(runs, comp, connect8, geotransform)

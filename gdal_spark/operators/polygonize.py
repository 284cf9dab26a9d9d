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

Step 4 has two strategies: the bbox-mask tracer (exact serial
parity, one task per component) and assemble_polygons_boundary — the
scale path that carries only O(perimeter) state per component, so a
raster-spanning component cannot OOM a task; 'auto' routes each
component by its bbox footprint.
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


BOUNDARY_ASSEMBLE_BBOX_PX = 4_000_000


def assemble_polygons_boundary(runs: DataFrame, comp: DataFrame,
                               geotransform=None) -> DataFrame:
    """Step 4, scale path: per-component rings from BOUNDARY EDGES —
    O(perimeter) state instead of the bbox-mask O(area) of
    assemble_polygons, so a continent-sized component no longer OOMs
    one task.

    Pipeline: labeled pixels -> 4 shifted self-joins find edges whose
    neighbor is background or another component -> directed unit
    segments (interior kept on a consistent side, so outers and holes
    come out with opposite winding) -> cross-tile/cross-task chain
    stitching with the same min-label machinery as contour
    (endpoint+comp join keys) -> per-ring assembly, per-component
    regroup.  Only a component's BOUNDARY meets in one task at the
    end.  Pinch corners (two diagonal lobes meeting at a point) are
    resolved by the chain walk and may split differently than the
    serial tracer — use the default bbox path when exact ring-count
    parity with trace_rings matters at small scale.
    """
    labeled = runs.join(comp, "node").select("comp", "value", "gy",
                                             "gx0", "gx1")
    px = labeled.select(
        "comp", "value", "gy",
        F.explode(F.sequence("gx0", "gx1")).alias("gx"))
    px = px.localCheckpoint(eager=True)

    def nb(dx, dy):
        return px.select(
            (F.col("gx") + dx).alias("gx"), (F.col("gy") + dy).alias("gy"),
            F.col("comp").alias("ncomp"))

    segs = None
    # directed clockwise-in-screen-coords: top TL->TR, right TR->BR,
    # bottom BR->BL, left BL->TL (corner (x,y) = pixel top-left).
    # nb(dx,dy) keys pixel (x-dx, y-dy), so the shift is the NEGATED
    # neighbor offset: top neighbor (0,-1) -> nb(0, 1), etc.
    for dx, dy, x1, y1, x2, y2 in (
            (0, 1, "gx", "gy", "gx + 1", "gy"),           # top
            (-1, 0, "gx + 1", "gy", "gx + 1", "gy + 1"),  # right
            (0, -1, "gx + 1", "gy + 1", "gx", "gy + 1"),  # bottom
            (1, 0, "gx", "gy + 1", "gx", "gy")):          # left
        j = px.join(nb(dx, dy), ["gx", "gy"], "left")
        b = j.filter(F.col("ncomp").isNull()
                     | (F.col("ncomp") != F.col("comp"))).select(
            "comp", "value",
            F.expr(x1).cast("double").alias("x1"),
            F.expr(y1).cast("double").alias("y1"),
            F.expr(x2).cast("double").alias("x2"),
            F.expr(y2).cast("double").alias("y2"))
        segs = b if segs is None else segs.unionByName(b)

    segs = segs.withColumn(
        "seg_id", F.xxhash64("comp", "x1", "y1", "x2", "y2"))
    segs = segs.localCheckpoint(eager=True)

    # stitch on exact endpoints WITHIN a component (comp in the key:
    # adjacent components share corner coordinates)
    a = segs.select("seg_id", "comp", F.col("x1").alias("ex"),
                    F.col("y1").alias("ey"))
    b2 = segs.select("seg_id", "comp", F.col("x2").alias("ex"),
                     F.col("y2").alias("ey"))
    pts = a.unionByName(b2)
    l = pts.select("comp", "ex", "ey", F.col("seg_id").alias("n_a"))
    r = pts.select("comp", "ex", "ey", F.col("seg_id").alias("n_b"))
    ep_edges = (
        l.join(r, ["comp", "ex", "ey"])
        .filter(F.col("n_a") != F.col("n_b"))
        .select("n_a", "n_b").distinct())
    nodes = segs.select(F.col("seg_id").alias("node")).distinct()
    ring_ids = global_labels(nodes, ep_edges).withColumnRenamed(
        "node", "seg_id").withColumnRenamed("comp", "ring_id")

    ringed = segs.join(ring_ids, "seg_id")

    def _mk_rings(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import contour as kc

        seg_list = [((row["x1"], row["y1"]), (row["x2"], row["y2"]))
                    for _, row in pdf.iterrows()]
        chains = kc.stitch_segments(seg_list)
        out = []
        for i, ptsl in enumerate(chains):
            if len(ptsl) < 4 or ptsl[0] != ptsl[-1]:
                continue
            out.append({
                "comp": int(pdf.iloc[0]["comp"]),
                "value": int(pdf.iloc[0]["value"]),
                "ring_id": int(key[0]),
                "chain_idx": i,
                "ring": [{"x": float(p[0]), "y": float(p[1])}
                         for p in ptsl],
            })
        return pd.DataFrame(
            out, columns=["comp", "value", "ring_id", "chain_idx", "ring"])

    rings = ringed.groupBy("ring_id").applyInPandas(
        _mk_rings,
        "comp long, value long, ring_id long, chain_idx int, "
        "ring array<struct<x:double,y:double>>")

    sizes = labeled.groupBy("comp").agg(
        F.sum(F.col("gx1") - F.col("gx0") + 1).alias("pixel_count"))

    def _mk_poly(key, pdf: pd.DataFrame) -> pd.DataFrame:
        world = []
        for _, row in pdf.sort_values(["ring_id", "chain_idx"]).iterrows():
            w = np.array([(p["x"], p["y"]) for p in row["ring"]],
                         dtype=np.float64)
            if geotransform is not None:
                ox, rx, _, oy, _, nry = geotransform
                w = np.column_stack([ox + w[:, 0] * rx, oy + w[:, 1] * nry])
            world.append(w)
        # WKB contract: exterior ring FIRST.  ring_id is hash-derived,
        # so order by |signed area| descending instead (a component's
        # exterior strictly contains its holes, hence largest |area|);
        # the (ring_id, chain_idx) presort keeps ties deterministic.
        if len(world) > 1:
            def _abs_area(r):
                x, y = r[:, 0], r[:, 1]
                return abs(float(
                    np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))) / 2.0
            world.sort(key=_abs_area, reverse=True)
        return pd.DataFrame([{
            "comp": int(key[0]),
            "value": int(pdf.iloc[0]["value"]),
            "pixel_count": 0,
            "n_rings": len(world),
            "wkb": kwkb.wkb_polygon(world),
        }])

    polys = rings.groupBy("comp").applyInPandas(
        _mk_poly, POLY_SCHEMA)
    return (
        polys.drop("pixel_count")
        .join(sizes, "comp")
        .select("comp", "value", "pixel_count", "n_rings", "wkb")
    )


def polygonize_tiles(tiles: DataFrame, dtype: str = "uint8",
                     tile_size: int = 256, connect8: bool = False,
                     nodata=0, geotransform=None,
                     assemble: str = "auto") -> DataFrame:
    """Full distributed polygonize (steps 1-4).

    assemble: 'bbox' (trace_rings on the component's bbox mask —
    exact serial-tracer parity, one task per component),
    'boundary' (perimeter-state scale path), or 'auto' (boundary for
    components whose bbox exceeds BOUNDARY_ASSEMBLE_BBOX_PX)."""
    runs = tile_runs(tiles, dtype, tile_size, connect8, nodata)
    runs = runs.cache()
    edges = equivalence_edges(runs, tile_size, connect8)
    comp = global_labels(runs, edges)
    if assemble == "bbox":
        return assemble_polygons(runs, comp, connect8, geotransform)
    if assemble == "boundary":
        return assemble_polygons_boundary(runs, comp, geotransform)
    # auto: route each component by its bbox footprint.  The list of
    # oversized components is tiny by construction (they exceed
    # BOUNDARY_ASSEMBLE_BBOX_PX pixels each), so collect their ids
    # once; the common all-small case costs one aggregate job and no
    # extra joins.
    ext = runs.join(comp, "node").groupBy("comp").agg(
        ((F.max("gx1") - F.min("gx0") + 1)
         * (F.max("gy") - F.min("gy") + 1)).alias("_bbox_px"))
    big_ids = [r["comp"] for r in ext.filter(
        F.col("_bbox_px") > BOUNDARY_ASSEMBLE_BBOX_PX).collect()]
    if not big_ids:
        return assemble_polygons(runs, comp, connect8, geotransform)
    small_comp = comp.filter(~F.col("comp").isin(big_ids))
    big_comp = comp.filter(F.col("comp").isin(big_ids))
    out_small = assemble_polygons(
        runs.join(small_comp.select("node"), "node"),
        comp, connect8, geotransform)
    out_big = assemble_polygons_boundary(
        runs.join(big_comp.select("node"), "node"), comp, geotransform)
    return out_small.unionByName(out_big)

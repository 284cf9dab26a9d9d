"""Linear referencing (ogrlineref roles, apps/ogrlineref.cpp):
position of a fraction along a polyline (CreatePartsFromPoint /
milepost interpolation) and the fraction of a point's projection
onto the line (GetPosition).

Everything is whole-stage-codegen Column math over exploded segment
rows — no Python in the hot path:

  lines (line_id, xs array, ys array)
    -> posexplode to segments (si, ax, ay, bx, by, seglen)
    -> window cumsum of seglen per line (one shuffle on line_id)
    -> interpolate: first segment whose [cum_before, cum_before +
       seglen] brackets fraction * total, then a + t * (b - a)
    -> locate: per-segment clamped projection t, rank by (d2, si),
       fraction = (cum_before + t * seglen) / total.

At scale, one polyline's segments colocate on the line_id shuffle;
lines fan out across the cluster (the reference is one line per
invocation — the cluster axis is ACROSS lines, like viewshed's
across-observers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# segment lengths quantize to 2^20 units/meter BEFORE accumulation:
# prefix sums of exact integers are order-independent, so Spark's
# left-to-right running window and any reassociating engine (DuckDB's
# running frame is a segment tree) agree bit-for-bit — the same
# scaled-integer convention as charlm's integer logs.  One unit is
# ~1 micron of arc length; parametric positions shift by < 1e-9
# relative vs true-length parametrization (immaterial for the
# ogrlineref roles), and in exchange cum/total/fraction arithmetic is
# EXACT at any accumulation order — the property that matters at
# cluster scale, where summation order is never guaranteed.
LENGTH_QUANT = 1048576.0


def _segments(lines: DataFrame) -> DataFrame:
    """(line_id, si, ax, ay, bx, by, seglen, cum_before, total)."""
    seg = lines.select(
        "line_id",
        F.posexplode(F.expr(
            "transform(sequence(1, size(xs) - 1), "
            "i -> struct(element_at(xs, i) as ax, element_at(ys, i) as ay, "
            "element_at(xs, i + 1) as bx, element_at(ys, i + 1) as by))"
        )).alias("si", "s"))
    seg = seg.select(
        "line_id", "si",
        F.col("s.ax").alias("ax"), F.col("s.ay").alias("ay"),
        F.col("s.bx").alias("bx"), F.col("s.by").alias("by"))
    seg = seg.withColumn(
        "seglen",
        F.floor(
            F.sqrt((F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
                   + (F.col("by") - F.col("ay"))
                   * (F.col("by") - F.col("ay")))
            * F.lit(LENGTH_QUANT) + F.lit(0.5)).cast("long"))
    w = Window.partitionBy("line_id").orderBy("si")
    wall = Window.partitionBy("line_id")
    return (seg.withColumn(
        "cum_before",
        F.coalesce(F.sum("seglen").over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long")))
        .withColumn("total", F.sum("seglen").over(wall)))


def interpolate_along(lines: DataFrame, fraction: float) -> DataFrame:
    """Point at ``fraction`` of each polyline's length
    (ST_Line_Interpolate_Point / ogrlineref -create milepost rule).
    Returns (line_id, x, y)."""
    seg = _segments(lines)
    target = F.lit(fraction) * F.col("total")
    cand = seg.filter(
        (F.col("cum_before") <= target)
        & (target <= F.col("cum_before") + F.col("seglen")))
    w = Window.partitionBy("line_id").orderBy("si")
    first = cand.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1)
    t = F.when(F.col("seglen") > 0,
               (target - F.col("cum_before")) / F.col("seglen")) \
        .otherwise(F.lit(0.0))
    return first.select(
        "line_id",
        (F.col("ax") + t * (F.col("bx") - F.col("ax"))).alias("x"),
        (F.col("ay") + t * (F.col("by") - F.col("ay"))).alias("y"))


def locate_point(lines: DataFrame, points: DataFrame) -> DataFrame:
    """Fraction of each point's nearest position along its line
    (ST_Line_Locate_Point / ogrlineref -get_pos).  points:
    (line_id, pid, px, py).  Returns (line_id, pid, frac)."""
    seg = _segments(lines)
    j = seg.join(points, "line_id")
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    # projection denominator is the TRUE squared length (dx^2 + dy^2),
    # not the quantized arc-length unit
    raw_t = ((F.col("px") - F.col("ax")) * dx
             + (F.col("py") - F.col("ay")) * dy) / (dx * dx + dy * dy)
    t = F.when(F.col("seglen") > 0,
               F.least(F.greatest(raw_t, F.lit(0.0)), F.lit(1.0))) \
        .otherwise(F.lit(0.0))
    qx = F.col("ax") + t * dx
    qy = F.col("ay") + t * dy
    d2 = (F.col("px") - qx) * (F.col("px") - qx) \
        + (F.col("py") - qy) * (F.col("py") - qy)
    scored = j.withColumn("_t", t).withColumn("_d2", d2)
    w = Window.partitionBy("line_id", "pid").orderBy(
        F.col("_d2").asc(), F.col("si").asc())
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1)
    frac = (F.col("cum_before") + F.col("_t") * F.col("seglen")) \
        / F.col("total")
    return best.select("line_id", "pid", frac.alias("frac"))


def line_substring(lines: DataFrame, d0: float, d1: float,
                   as_ratio: bool = True) -> DataFrame:
    """Sub-polyline between two distances along each line
    (OGRSimpleCurve::getSubLine, ogr/ogrlinestring.cpp:2250-2439;
    the part-extraction step of ogrlineref -create between mileposts,
    apps/ogrlineref.cpp:339-385).  Returns (line_id, vi, x, y) vertex
    rows in order.

    Faithful to the reference, including its quirks:
      * distances clamp to [0, length]; as_ratio multiplies by length
        first (:2261-2266);
      * the start/end vertices interpolate x*(1-r) + x2*r inside the
        FIRST bracketing segment with seglen > 0 — zero-length
        segments never bracket (:2305-2310 ``if (dfSegLength > 0)``);
      * when d0 == 0 the reference emits the first vertex TWICE
        (ogrlinestring.cpp:2286-2296 adds paoPoints[0], then the
        "Add points" loop at :2342 re-adds index 0 because ``i``
        was never advanced) — reproduced bit-for-bit;
      * interior vertices are the original segment-start points from
        s0+1 through the end-bracketing segment s1.

    Pure Column math: one cumsum window per line (single shuffle),
    then three unioned vertex classes; lines fan out across the
    cluster exactly like interpolate_along.
    """
    seg = _segments(lines)
    if as_ratio:
        t0 = F.lit(float(d0)) * F.col("total")
        t1 = F.lit(float(d1)) * F.col("total")
    else:
        # absolute distances are meters: express them in the
        # quantized arc-length units cum_before/total live in
        t0 = F.lit(float(d0) * LENGTH_QUANT)
        t1 = F.lit(float(d1) * LENGTH_QUANT)
    t0 = F.greatest(t0, F.lit(0.0))
    t1 = F.least(t1, F.col("total"))
    seg = seg.withColumn("_t0", t0).withColumn("_t1", t1)

    brack0 = ((F.col("seglen") > 0) & (F.col("cum_before") <= F.col("_t0"))
              & (F.col("_t0") <= F.col("cum_before") + F.col("seglen")))
    brack1 = ((F.col("seglen") > 0) & (F.col("cum_before") <= F.col("_t1"))
              & (F.col("_t1") <= F.col("cum_before") + F.col("seglen")))

    wline = Window.partitionBy("line_id")
    # s0 = -1 when t0 == 0 (reference keeps i = 0 and re-adds vertex 0)
    s0 = F.when(F.col("_t0") == 0, F.lit(-1)).otherwise(
        F.min(F.when(brack0, F.col("si"))).over(wline))
    s1 = F.min(F.when(brack1, F.col("si"))).over(wline)
    seg = (seg.withColumn("_s0", s0).withColumn("_s1", s1)
           .withColumn("_nseg", F.max("si").over(wline) + 1))

    def _interp(target):
        r = (target - F.col("cum_before")) / F.col("seglen")
        return (F.col("ax") * (1 - r) + F.col("bx") * r,
                F.col("ay") * (1 - r) + F.col("by") * r)

    # start vertex: interp in s0 (or the raw first vertex when t0 == 0)
    sx, sy = _interp(F.col("_t0"))
    start = seg.filter(
        F.when(F.col("_s0") == -1, F.col("si") == 0)
        .otherwise(F.col("si") == F.col("_s0"))).select(
        "line_id", F.lit(0).alias("ord"), F.lit(0).alias("sub"),
        F.when(F.col("_s0") == -1, F.col("ax")).otherwise(sx).alias("x"),
        F.when(F.col("_s0") == -1, F.col("ay")).otherwise(sy).alias("y"))

    # middle vertices: original segment-start points s0+1 .. s1
    # (when s1 is null — t1 never bracketed, e.g. all-zero line — the
    # reference walks to the end and appends the final vertex)
    s1_eff = F.coalesce(F.col("_s1"), F.col("_nseg") - 1)
    middle = seg.filter((F.col("si") > F.col("_s0"))
                        & (F.col("si") <= s1_eff)).select(
        "line_id", (F.col("si") + 1).alias("ord"), F.lit(0).alias("sub"),
        F.col("ax").alias("x"), F.col("ay").alias("y"))

    # end vertex: interp in s1 unless t0 and t1 share the segment (the
    # reference then returns the two interpolated points immediately,
    # :2333-2341); when s1 is null, the raw last vertex
    ex, ey = _interp(F.col("_t1"))
    end = seg.filter(F.col("si") == s1_eff).select(
        "line_id", (F.col("si") + 2).alias("ord"), F.lit(1).alias("sub"),
        F.when(F.col("_s1").isNull(), F.col("bx")).otherwise(ex).alias("x"),
        F.when(F.col("_s1").isNull(), F.col("by")).otherwise(ey).alias("y"))

    allv = start.unionByName(middle).unionByName(end)
    wv = Window.partitionBy("line_id").orderBy("ord", "sub")
    return (allv.withColumn("vi", F.row_number().over(wv) - 1)
            .select("line_id", "vi", "x", "y"))


def segmentize(lines: DataFrame, max_length: float) -> DataFrame:
    """Densify each polyline so no segment exceeds ``max_length``
    (OGRSimpleCurve::segmentize, ogr/ogrlinestring.cpp:2661-2810;
    the ogr2ogr -segmentize role).  Returns (line_id, vi, x, y).

    Reference rules, exactly:
      * direction normalization so a line and its reverse segmentize
        identically (:2674-2682): if P0 < Pn by (x, then y), the line
        is reversed, segmentized, and reversed back;
      * a segment splits only when d2 - maxlen^2 > 1e-5 * maxlen^2
        (:2687-2702 REL_EPSILON_LENGTH_SQUARE);
      * n_intermediate = floor(sqrt(d2 / maxlen^2) - 1e-2)
        (REL_EPSILON_ROUND), each at a_j = a + j * (delta / (n+1))
        (:2788-2802 — note the ratio is divided ONCE, then scaled by
        j, not j/(n+1) per point).

    Column math end-to-end: per-line reversal is an array reverse on
    the grouped form; the split explodes a JVM ``sequence``; the
    output order re-reverses via (n_total - 1 - vi).
    """
    rev = (F.element_at("xs", 1) < F.element_at("xs", -1)) | (
        (F.element_at("xs", 1) == F.element_at("xs", -1))
        & (F.element_at("ys", 1) < F.element_at("ys", -1)))
    norm = lines.select(
        "line_id", rev.alias("_rev"),
        F.when(rev, F.reverse("xs")).otherwise(F.col("xs")).alias("xs"),
        F.when(rev, F.reverse("ys")).otherwise(F.col("ys")).alias("ys"))

    seg = _segments(norm.select("line_id", "xs", "ys")) \
        .join(norm.select("line_id", "_rev"), "line_id")
    m2 = float(max_length) * float(max_length)
    d2 = (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax")) \
        + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
    split = (d2 - F.lit(m2)) > F.lit(1e-5 * m2)
    n_int = F.when(split, F.floor(F.sqrt(d2 / F.lit(m2)) - F.lit(1e-2))
                   .cast("int")).otherwise(F.lit(0))
    seg = seg.withColumn("_n", n_int)

    # j = 0 emits the segment start vertex; j in 1..n the intermediates
    pts = seg.select(
        "line_id", "si", "_rev", "ax", "ay", "bx", "by", "_n",
        F.explode(F.sequence(F.lit(0), F.col("_n"))).alias("j"))
    rx = (F.col("bx") - F.col("ax")) / (F.col("_n").cast("double") + 1.0)
    ry = (F.col("by") - F.col("ay")) / (F.col("_n").cast("double") + 1.0)
    pts = pts.select(
        "line_id", "si", "_rev", "j",
        (F.col("ax") + F.col("j") * rx).alias("x"),
        (F.col("ay") + F.col("j") * ry).alias("y"))

    # final vertex of each line (segments only cover starts)
    last = norm.select(
        "line_id", "_rev",
        F.lit(2_000_000_000).alias("si"), F.lit(0).alias("j"),
        F.element_at("xs", -1).alias("x"), F.element_at("ys", -1).alias("y"))
    allp = pts.select("line_id", "_rev", "si", "j", "x", "y") \
        .unionByName(last)

    wv = Window.partitionBy("line_id").orderBy("si", "j")
    wn = Window.partitionBy("line_id")
    out = (allp.withColumn("_fwd", F.row_number().over(wv) - 1)
           .withColumn("_cnt", F.count("*").over(wn)))
    vi = F.when(F.col("_rev"), F.col("_cnt") - 1 - F.col("_fwd")) \
        .otherwise(F.col("_fwd"))
    return out.select("line_id", vi.cast("int").alias("vi"), "x", "y")

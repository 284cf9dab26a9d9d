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
        F.sqrt((F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
               + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))))
    w = Window.partitionBy("line_id").orderBy("si")
    wall = Window.partitionBy("line_id")
    return (seg.withColumn(
        "cum_before",
        F.coalesce(F.sum("seglen").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0.0)))
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
    raw_t = ((F.col("px") - F.col("ax")) * dx
             + (F.col("py") - F.col("ay")) * dy) \
        / (F.col("seglen") * F.col("seglen"))
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

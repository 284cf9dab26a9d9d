"""Multidimensional array (GDALMDArray) operator surface — §1.3.

GDAL's mdim model (gcore/gdalmultidim.cpp) serves N-D arrays through
composable *views*; the Spark-native representation is a long-form
DataFrame with one integer column per dimension plus ``value`` (the
layout netCDF/Zarr ingestion naturally produces at 100 TB — one row
per cell, partitioned by the leading dims so slices prune).

Implemented views (each a narrow, zero-shuffle Column plan — Catalyst
pushes the slice predicates into the parquet scan):

* ``mdim_slice``     — GetView("[start:stop:step,...]") subsetting
  (gcore/gdalmultidim.cpp:5762 GetView; slice semantics follow the
  Python-buffer rules GDAL mirrors: kept index ``i`` satisfies
  start <= i < stop and (i-start) % step == 0, re-indexed to
  (i-start)/step).
* ``mdim_transpose`` — axis permutation (GDALMDArray::Transpose,
  gcore/gdalmultidim.cpp:6205): dimension columns are renamed by the
  axis map; data never moves.
* ``mdim_unscaled``  — GetUnscaled (gcore/gdalmultidim.cpp:2935):
  unscaled = raw * scale + offset, with raw == nodata mapped to NULL
  (GDALMDArrayUnscaled, gcore/gdalmultidim.cpp:45 turns nodata into
  NaN for float buffers; NULL is the relational spelling).
* ``mdim_mask``      — GetMask validity mask
  (gcore/gdalmultidim.cpp:7484 CreateMask semantics): 1 where the
  cell is valid = not nodata and inside [valid_min, valid_max]
  (attribute rules per netCDF conventions GDAL applies), else 0.

At scale: all four ops are per-row projections/filters — no
shuffle, no Python.  A 10^12-cell hypercube slices at scan speed with
partition pruning on the leading dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mdim_slice(df: DataFrame,
               spec: dict[str, tuple[int, int, int]]) -> DataFrame:
    """Subset + re-index dimensions.  ``spec[dim] = (start, stop,
    step)``; unlisted dim columns pass through untouched."""
    out = df
    for dim, (start, stop, step) in spec.items():
        if step <= 0:
            raise ValueError(f"step must be positive for dim {dim!r}")
        c = F.col(dim)
        out = out.filter(
            (c >= start) & (c < stop) & (((c - start) % step) == 0)
        ).withColumn(dim, ((c - start) / step).cast("long"))
    return out


def mdim_transpose(df: DataFrame, dims: list[str],
                   axis_map: list[int]) -> DataFrame:
    """Permute dimension columns: output dim ``k`` is input dim
    ``axis_map[k]`` (GDALMDArray::Transpose axis-map contract,
    gdalmultidim.cpp:6205).  Pure rename — zero data movement."""
    if sorted(axis_map) != list(range(len(dims))):
        raise ValueError(f"axis_map must permute 0..{len(dims) - 1}")
    sel = [F.col(dims[src]).alias(dims[k])
           for k, src in enumerate(axis_map)]
    rest = [F.col(c) for c in df.columns if c not in dims]
    return df.select(*sel, *rest)


def mdim_unscaled(df: DataFrame, scale: float, offset: float,
                  nodata: float | None = None,
                  value_col: str = "value",
                  out_col: str = "unscaled") -> DataFrame:
    """unscaled = raw * scale + offset; nodata -> NULL
    (gdalmultidim.cpp:2935 formula)."""
    v = F.col(value_col)
    expr = v.cast("double") * F.lit(float(scale)) + F.lit(float(offset))
    if nodata is not None:
        expr = F.when(v == F.lit(nodata), F.lit(None)).otherwise(expr)
    return df.withColumn(out_col, expr)


def mdim_mask(df: DataFrame, nodata: float | None = None,
              valid_min: float | None = None,
              valid_max: float | None = None,
              value_col: str = "value",
              out_col: str = "mask") -> DataFrame:
    """Validity mask: 1 = valid, 0 = invalid (GetMask,
    gdalmultidim.cpp:7484; netCDF _FillValue/valid_min/valid_max
    attribute rules)."""
    v = F.col(value_col)
    valid = F.lit(True)
    if nodata is not None:
        valid = valid & (v != F.lit(nodata))
    if valid_min is not None:
        valid = valid & (v >= F.lit(valid_min))
    if valid_max is not None:
        valid = valid & (v <= F.lit(valid_max))
    return df.withColumn(out_col, valid.cast("int"))


# ---------------------------------------------------------------- resample
def _src_center(dst_col, scale: float):
    """Continuous source coordinate of a destination sample center:
    c = (i + 0.5) * scale - 0.5 (the GDALRasterIO convention
    GetResampled inherits, gcore/gdalmultidim.cpp:8541 family)."""
    return (dst_col.cast("double") + F.lit(0.5)) * F.lit(scale) - F.lit(0.5)


def mdim_resample(df: DataFrame, y_dim: str, x_dim: str,
                  src_shape: tuple[int, int], dst_shape: tuple[int, int],
                  alg: str = "nearest",
                  value_col: str = "value") -> DataFrame:
    """GDALMDArray::GetResampled (gcore/gdalmultidim.cpp:8541) over the
    trailing (y, x) dims of a long-form hypercube; leading dim columns
    pass through as group keys.

    Spark-first inversion — instead of gathering source neighbors per
    destination cell (a random-access read Spark can't do), every
    SOURCE cell *emits* the destination cells it serves:

    * ``nearest``: dst index i reads src index round-half-up of
      ``(i+0.5)*scale - 0.5`` = floor((i+0.5)*scale); src j therefore
      serves the contiguous dst range [ceil(j/scale - 0.5),
      ceil((j+1)/scale - 0.5)).  One ``sequence``+``explode`` per row —
      a narrow map-side Generate, ZERO shuffle at any scale.
    * ``bilinear``: dst i interpolates src floor(c) and floor(c)+1
      (edge-clamped) with weights (1-frac, frac) per axis; src j emits
      one weighted contribution per dst cell whose stencil touches it,
      then a partial+final ``sum(w*v)/sum(w)`` groupBy reassembles —
      ONE shuffle on (leading dims, yd, xd), map-side combined.
    * ``average``: plain downsample binning — src j belongs to dst
      floor(j/scale); groupBy mean, one shuffle, partial agg.

    At 10^12 cells the nearest path is scan-speed; bilinear/average
    shuffle exactly the output-sized contribution stream.
    """
    sy, sx = src_shape
    dy, dx = dst_shape
    scy, scx = sy / dy, sx / dx
    lead = [c for c in df.columns if c not in (y_dim, x_dim, value_col)]
    v = F.col(value_col)

    if alg == "nearest":
        def served(src_col, scale, n_dst):
            # dst i reads src floor((i+0.5)*scale)  =>  src j serves
            # i in [ceil((j)/scale - 0.5), ceil((j+1)/scale - 0.5))
            j = src_col.cast("double")
            lo = F.greatest(F.lit(0), F.ceil(j / F.lit(scale) - 0.5))
            hi = F.least(F.lit(n_dst),
                         F.ceil((j + 1) / F.lit(scale) - 0.5))
            return F.when(lo < hi,
                          F.sequence(lo.cast("long"),
                                     hi.cast("long") - 1)
                          ).otherwise(F.array().cast("array<long>"))

        out = (df
               .withColumn("_yd", F.explode(served(F.col(y_dim), scy, dy)))
               .withColumn("_xd", F.explode(served(F.col(x_dim), scx, dx))))
        return out.select(*lead, F.col("_yd").alias(y_dim),
                          F.col("_xd").alias(x_dim), v.alias(value_col))

    if alg == "average":
        out = df.groupBy(
            *lead,
            F.floor(F.col(y_dim) / F.lit(scy)).cast("long").alias(y_dim),
            F.floor(F.col(x_dim) / F.lit(scx)).cast("long").alias(x_dim),
        ).agg(F.avg(v).alias(value_col))
        return out.select(*lead, y_dim, x_dim, value_col)

    if alg == "cubic":
        # 4-tap cubic convolution (a = -0.5, the GDALResampleAlg
        # kernel): src j contributes to every dst cell whose center
        # falls within 2 src pixels; edge windows renormalize via the
        # same sum(w*v)/sum(w) the interior uses.
        def contrib4(src_col, scale, n_src, n_dst):
            j = src_col.cast("double")
            lo = F.ceil((j - 2 + 0.5) / F.lit(scale) - 0.5)
            hi = F.floor((j + 2 + 0.5) / F.lit(scale) - 0.5)
            lo = F.greatest(F.lit(0), lo).cast("long")
            hi = F.least(F.lit(n_dst - 1), hi).cast("long")
            return F.when(lo <= hi, F.sequence(lo, hi)) \
                    .otherwise(F.array().cast("array<long>"))

        def wcubic(dst_col, src_col, scale):
            a = -0.5
            t = F.abs(_src_center(dst_col, scale) - src_col.cast("double"))
            t2, t3 = t * t, t * t * t
            near = (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0
            far = a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a
            return (F.when(t < 1.0, near)
                     .when(t < 2.0, far)
                     .otherwise(F.lit(0.0)))

        out = (df
               .withColumn("_yd", F.explode(
                   contrib4(F.col(y_dim), scy, sy, dy)))
               .withColumn("_xd", F.explode(
                   contrib4(F.col(x_dim), scx, sx, dx)))
               .withColumn("_w", wcubic(F.col("_yd"), F.col(y_dim), scy)
                           * wcubic(F.col("_xd"), F.col(x_dim), scx))
               .filter(F.col("_w") != 0))
        agg = out.groupBy(*lead, F.col("_yd").alias(y_dim),
                          F.col("_xd").alias(x_dim)).agg(
            (F.sum(F.col("_w") * v) / F.sum("_w")).alias(value_col))
        return agg.select(*lead, y_dim, x_dim, value_col)

    if alg != "bilinear":
        raise ValueError(f"unsupported resample alg {alg!r}")

    # bilinear: src j touches dst i where clamp(floor(c)) or
    # clamp(floor(c))+1 == j, c = (i+0.5)*scale - 0.5.  Enumerate the
    # candidate dst window per src cell, compute the exact weight, keep
    # non-zero contributions.
    def contrib(src_col, scale, n_src, n_dst):
        j = src_col.cast("double")
        # c in [j-1, j+1] covers every dst whose stencil can touch j
        # (clamping at the borders widens the first/last src cell).
        lo = F.ceil((j - 1 + 0.5) / F.lit(scale) - 0.5)
        hi = F.floor((j + 1 + 0.5) / F.lit(scale) - 0.5)
        if n_src > 1:
            lo = F.when(src_col == 0, F.lit(0)).otherwise(lo)
            hi = F.when(src_col == n_src - 1, F.lit(n_dst - 1)).otherwise(hi)
        else:
            lo, hi = F.lit(0), F.lit(n_dst - 1)
        lo = F.greatest(F.lit(0), lo).cast("long")
        hi = F.least(F.lit(n_dst - 1), hi).cast("long")
        return F.when(lo <= hi, F.sequence(lo, hi)) \
                .otherwise(F.array().cast("array<long>"))

    def weight(dst_col, src_col, scale, n_src):
        c = _src_center(dst_col, scale)
        c = F.greatest(F.lit(0.0), F.least(F.lit(float(n_src - 1)), c))
        j0 = F.floor(c)
        frac = c - j0
        return (F.when(src_col == j0, 1.0 - frac)
                 .when((src_col == j0 + 1), frac)
                 .otherwise(F.lit(0.0)))

    out = (df
           .withColumn("_yd", F.explode(contrib(F.col(y_dim), scy, sy, dy)))
           .withColumn("_xd", F.explode(contrib(F.col(x_dim), scx, sx, dx)))
           .withColumn("_w", weight(F.col("_yd"), F.col(y_dim), scy, sy)
                       * weight(F.col("_xd"), F.col(x_dim), scx, sx))
           .filter(F.col("_w") > 0))
    agg = out.groupBy(*lead, F.col("_yd").alias(y_dim),
                      F.col("_xd").alias(x_dim)).agg(
        (F.sum(F.col("_w") * v) / F.sum("_w")).alias(value_col))
    return agg.select(*lead, y_dim, x_dim, value_col)


def mdim_statistics(df: DataFrame, nodata: float | None = None,
                    value_col: str = "value",
                    by: list[str] | None = None) -> DataFrame:
    """GDALMDArray::GetStatistics / ComputeStatistics
    (gcore/gdalmultidim.cpp:10280): min, max, mean, POPULATION stddev
    and valid count over the array, nodata excluded — one partial+final
    aggregate scan, identical shape at 10^12 cells.  ``by`` computes
    per-slice statistics (e.g. per leading dim) instead of global."""
    v = F.col(value_col).cast("double")
    if nodata is not None:
        v = F.when(F.col(value_col) == F.lit(nodata), None).otherwise(v)
    aggs = [
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.avg(v).alias("mean"),
        # population stddev = sqrt(E[x^2] - E[x]^2), GDAL's formula
        F.sqrt(F.avg(v * v) - F.avg(v) * F.avg(v)).alias("std"),
        F.count(v).alias("valid_count"),
    ]
    return df.groupBy(*(by or [])).agg(*aggs)

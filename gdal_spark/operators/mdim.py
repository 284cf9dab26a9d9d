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

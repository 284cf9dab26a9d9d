"""gdal_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the GDAL/OGR capability surface
(reference: /root/reference, GDAL 3.x) as Spark DataFrame plans plus
Arrow-vectorized numpy kernels.  Not a port: GDAL's C execution
machinery (block cache, pull iterators, thread pools) maps onto
Catalyst/Tungsten; only the *semantics* (cell math, ray-cast
point-in-polygon, scanline rasterization, golden checksums) are
reproduced bit-for-bit in `gdal_spark.kernels`.

Layout
------
kernels/    pure-numpy bit-match kernels (shared by UDFs, oracles, tests)
functions/  Column-level + pandas-UDF spatial functions
operators/  distributed operators (spatial join, kNN, rasterize, ...)
sources/    deterministic fixture generators + IO helpers
plans/      pipelines, lineage / resume
streaming/  structured-streaming ingest adapters
"""

__version__ = "0.1.0"

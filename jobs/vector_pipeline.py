"""`gdal vector pipeline` role: a declarative read -> steps -> write
runner (spark-submit --py-files job + importable library).

Reference: the dataflow pipeline CLI
(/root/reference/apps/gdalalg_vector_pipeline.cpp:100-165 registers
the step algorithms; gdalalg_abstract_pipeline.h chains them).  Steps
mirror the reference's registry where this engine has the operator:

  read                 parquet / geojson / geojson-seq / wkt-csv /
                       shapefile / gpkg     (sources/)
  filter               WHERE expression      (gdalalg_vector_filter)
  select               field list            (gdalalg_vector_select)
  sql                  OGR SQL statement     (gdalalg_vector_sql,
                       dialect shim sql/ogr_dialect.py)
  swap-xy              swap coordinate cols  (gdalalg_vector_swap_xy)
  concat               union further sources (gdalalg_vector_concat)
  reproject            EPSG:3857 / EPSG:326xx-327xx over lon/lat cols
                       (gdalalg_vector_reproject)
  segmentize           max_length over (line_id, vi, x, y) vertex
                       tables                (gdalalg_vector_segmentize)
  explode-collections  Multi* WKB -> parts   (gdalalg_vector_explode_
                       collections)
  buffer / simplify / make-valid / curve-to-line
                       ST-registry-backed wkb transforms
                       (gdalalg_vector_buffer/_simplify/_make_valid)
  write                parquet, plain or lineage-committed units
                       (resumable, operators/lineage.py)

Each step is a pure DataFrame transform, so the whole pipeline stays
one lazy Catalyst plan until the final write — filters declared last
still push down into the scan.  Unknown steps fail fast with the
supported list (the reference errors the same way on unknown step
names).

Usage (CLI):
    spark-submit --py-files gdal_spark.zip jobs/vector_pipeline.py \
        --pipeline pipeline.json [--cpus 8]
where pipeline.json is a JSON list of step objects:
    [{"step": "read", "format": "parquet", "path": ".../documents.parquet"},
     {"step": "filter", "where": "doc_id % 2 = 0"},
     {"step": "select", "fields": ["doc_id", "text"]},
     {"step": "write", "path": "/tmp/out", "units": 8}]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402


def _read(spark: SparkSession, df, spec):
    from gdal_spark.sources import readers
    fmt = spec.get("format", "parquet")
    path = spec["path"]
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "geojson":
        return readers.read_geojson(spark, path)
    if fmt == "geojson-seq":
        return readers.read_geojson_seq(spark, path)
    if fmt == "wkt-csv":
        return readers.read_wkt_csv(spark, path)
    if fmt == "shapefile":
        from gdal_spark.sources.shapefile import read_shapefile
        return read_shapefile(spark, path)
    if fmt == "gpkg":
        from gdal_spark.sources.geopackage import read_geopackage
        return read_geopackage(spark, path,
                               table=spec.get("table", "features"))
    raise ValueError(f"read: unsupported format {fmt!r}")


def _filter(spark, df, spec):
    return df.filter(F.expr(spec["where"]))


def _select(spark, df, spec):
    return df.select(*spec["fields"])


def _sql(spark, df, spec):
    from gdal_spark.sql.ogr_dialect import ogr_sql, register_layer
    register_layer(spark, spec.get("layer", "input"), df)
    return ogr_sql(spark, spec["statement"])


def _swap_xy(spark, df, spec):
    xc, yc = spec.get("x", "x"), spec.get("y", "y")
    return df.withColumn("__t", F.col(xc)) \
             .withColumn(xc, F.col(yc)) \
             .withColumn(yc, F.col("__t")).drop("__t")


def _reproject(spark, df, spec):
    dst = spec["dst"].upper()
    lon, lat = spec.get("lon", "lon"), spec.get("lat", "lat")
    if dst == "EPSG:3857":
        from gdal_spark.operators.warp import lonlat_to_mercator_cols
        mx, my = lonlat_to_mercator_cols(F.col(lon), F.col(lat))
        return df.withColumn("x", mx).withColumn("y", my)
    if dst.startswith("EPSG:326") or dst.startswith("EPSG:327"):
        from gdal_spark.operators.tmerc import utm_forward
        zone = int(dst[8:])
        # EPSG:327xx = UTM south: 10,000,000 m false northing, same
        # as ST_Transform (functions/st.py) — the two paths must agree.
        return utm_forward(df, lon, lat, zone,
                           south=dst.startswith("EPSG:327"))
    raise ValueError(f"reproject: unsupported dst {dst!r}")


def _segmentize(spark, df, spec):
    from gdal_spark.operators.lineref import segmentize
    return segmentize(df, float(spec["max_length"]))


def _explode_collections(spark, df, spec):
    from gdal_spark.operators.geometry import explode_collections
    return explode_collections(df, id_col=spec.get("id", "doc_id"),
                               wkb_col=spec.get("wkb", "wkb"))


def _concat(spark, df, spec):
    """gdalalg_vector_concat role: union further sources (same
    schema by name) onto the current frame."""
    out = df
    for src in spec["sources"]:
        other = _read(spark, None, src)
        out = other if out is None else out.unionByName(
            other, allowMissingColumns=bool(spec.get("allow_missing")))
    return out


def _st_expr(fn_name):
    """Steps backed by the registered ST_* surface
    (gdalalg_vector_buffer / _simplify / _make_valid / the curve
    linearization): apply one ST function to the wkb column."""
    def step(spark, df, spec):
        from gdal_spark.functions.st import register_st_functions
        register_st_functions(spark)
        wkb = spec.get("wkb", "wkb")
        args = [str(float(spec["arg"]))] if "arg" in spec else []
        call = ", ".join([wkb] + args)
        return df.withColumn(spec.get("out", wkb),
                             F.expr(f"{fn_name}({call})"))
    return step


def _write(spark, df, spec):
    path = spec["path"]
    units = spec.get("units")
    if not units:
        df.write.mode("overwrite").parquet(path)
        return df
    from gdal_spark.operators import lineage as ln
    key = spec.get("unit_key", df.columns[0])
    unit = (F.crc32(F.col(key).cast("string")) % int(units)).cast("long")
    run_id = spec.get("run_id", f"vp-{int(time.time())}")
    ln.commit_partitioned(spark, path, run_id,
                          spec.get("stage", "write"),
                          df.withColumn("unit", unit))
    return df


STEPS = {
    "read": _read,
    "filter": _filter,
    "select": _select,
    "sql": _sql,
    "swap-xy": _swap_xy,
    "reproject": _reproject,
    "segmentize": _segmentize,
    "explode-collections": _explode_collections,
    "concat": _concat,
    "buffer": _st_expr("ST_Buffer"),
    "simplify": _st_expr("ST_Simplify"),
    "make-valid": _st_expr("ST_MakeValid"),
    "curve-to-line": _st_expr("ST_CurveToLine"),
    "write": _write,
}


def run_vector_pipeline(spark: SparkSession,
                        steps: list[dict]) -> DataFrame:
    """Interpret a step list; returns the final DataFrame (the
    result of the last step — for `write`, the written frame)."""
    if not steps or steps[0].get("step") != "read":
        raise ValueError("pipeline must start with a 'read' step")
    df: DataFrame | None = None
    for spec in steps:
        name = spec.get("step")
        fn = STEPS.get(name)
        if fn is None:
            raise ValueError(
                f"unknown step {name!r}; supported: {sorted(STEPS)}")
        df = fn(spark, df, spec)
    return df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", required=True,
                    help="JSON file: list of step objects")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from gdal_spark.session import get_spark
    spark = get_spark("vector-pipeline", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    with open(args.pipeline) as f:
        steps = json.load(f)
    out = run_vector_pipeline(spark, steps)
    n = out.count() if out is not None else 0
    print(json.dumps({"rows": n, "steps": len(steps)}))


if __name__ == "__main__":
    main()

"""Local mirror of the driver's correctness gate.

Runs every catalog query at sf0.01 on Spark AND its DuckDB oracle,
compares row count, column-name set, and sorted values EXACTLY
(predicting the driver's value-hash).  Usage:

    python scripts/check.py [query ...]       # default: all
    SPARK_GRAFT_SF_DIR=... python scripts/check.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    from gdal_spark.oracle import check_query, connect_oracle
    from gdal_spark.queries import QUERIES
    from gdal_spark.session import get_spark

    spark = get_spark("check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    con = connect_oracle(sf_dir)

    n_pass = n_fail = n_skip = 0
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            problems = check_query(spark, con, q, sf_dir)
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if q.sql is None:
            print(f"OK(rows-only) {name} ({dt:.1f}s)")
            n_skip += 1
        elif problems:
            print(f"FAIL {name} ({dt:.1f}s)")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

"""Time a subset of registry queries with bench.py's exact methodology
(best-of-N, scoped-cache release between queries, count() action).

Usage: python tools/bench_subset.py <name> [<name> ...]
       python tools/bench_subset.py --headline
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from lakefs_iceberg_catalog_spark import registry
from lakefs_iceberg_catalog_spark.session import get_spark


def main() -> None:
    names = bench.HEADLINE if sys.argv[1] == "--headline" else sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    loads: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    timings = bench._time_queries(spark, names, sf_dir, loads, reps, errors)
    print(json.dumps({
        "queries": timings,
        "total": round(sum(timings.values()), 4),
        "reps": reps,
        "load1_per_query": loads,
        "errors": errors,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

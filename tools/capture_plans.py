"""Capture .explain('formatted') output for named registry queries into
plans/r15/<query>_<tag>.txt — the optimization-round evidence trail.

Usage: python tools/capture_plans.py <tag> <query> [<query> ...]
       python tools/capture_plans.py <tag> --headline
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakefs_iceberg_catalog_spark import registry
from lakefs_iceberg_catalog_spark.operators.util import release_scoped
from lakefs_iceberg_catalog_spark.session import get_spark

HEADLINE = [
    "flagship_top_unshipped", "q1_pricing_summary", "agg_hash_group",
    "agg_distinct", "join_inner_equi", "join_left_outer", "join_asof",
    "window_rank", "window_analytic", "limit_topk", "scalar_json",
    "scalar_array_map", "dedup_exact", "dedup_near_minhash",
    "dedup_ngram_jaccard", "similarity_topk", "text_stats",
    "text_fingerprint", "stream_tumbling_window", "pipeline_training_corpus",
]


def main() -> None:
    tag = sys.argv[1]
    names = HEADLINE if sys.argv[2] == "--headline" else sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        release_scoped()
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    release_scoped()
    spark.stop()


if __name__ == "__main__":
    main()

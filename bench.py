"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as a full action (count of the materialized result) after
a shared-session warmup, so JVM startup is excluded but plan+execute is
included — the same thing a cluster job would pay per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakefs_iceberg_catalog_spark import registry
from lakefs_iceberg_catalog_spark.session import get_spark

# Headline set: one representative per operator family (joins, aggs, windows,
# scalars, dedup/similarity/text once those rings land).
# FROZEN for comparability: BASELINE.md's measured table is this exact set,
# so `value` stays apples-to-apples across rounds. Round-2+ operators are
# timed separately under `extra_queries` / `extra_total`.
HEADLINE = [
    "flagship_top_unshipped",
    "q1_pricing_summary",
    "agg_hash_group",
    "agg_distinct",
    "join_inner_equi",
    "join_left_outer",
    "join_asof",
    "window_rank",
    "window_analytic",
    "limit_topk",
    "scalar_json",
    "scalar_array_map",
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "text_stats",
    "text_fingerprint",
    "stream_tumbling_window",
    "pipeline_training_corpus",
]

# Round-2 additions, timed but kept OUT of the baseline-comparable total.
EXTRA = [
    "q5_local_supplier",
    "q10_returned_items",
    "q14_promo_share",
    "q18_large_volume",
    "join_salted_skew",
    "dedup_embedding_cosine",
    "similarity_ann_ivf",
    "text_pii_scrub",
    "sample_stratified_hash",
]


def _time_queries(spark, names, sf_dir) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(2):  # best-of-2: steady-state, robust to ambient load
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            assert n >= 0
        timings[name] = round(best, 4)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry.load_all()
    spark = get_spark("lakefs-iceberg-catalog-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: spin the JVM/codegen paths once on a trivial action.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings = _time_queries(spark, HEADLINE, sf_dir)
    total = round(sum(timings.values()), 4)
    extra = _time_queries(spark, EXTRA, sf_dir)
    # Host-load context: this container shares a noisy host (single runs
    # inflate 3-6× under ambient load); the 1-minute loadavg lets a reader
    # tell a code regression from a busy-host artifact.
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extra_queries": extra,
                "extra_total": round(sum(extra.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load1": load1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

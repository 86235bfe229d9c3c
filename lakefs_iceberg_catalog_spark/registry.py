"""Central operator registry.

Each operator module registers ``name -> fn(spark, sf_dir) -> DataFrame`` plus
(optionally) an equivalent ANSI-SQL string runnable by DuckDB on the same
parquet tables.  ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
wrappers over these dicts, and the pytest suite replays the driver's
Spark-vs-DuckDB comparison for every registered pair.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "lakefs_iceberg_catalog_spark.operators.relational",
    "lakefs_iceberg_catalog_spark.operators.tpch_extra",
    "lakefs_iceberg_catalog_spark.operators.joins",
    "lakefs_iceberg_catalog_spark.operators.windows",
    "lakefs_iceberg_catalog_spark.operators.scalars",
    "lakefs_iceberg_catalog_spark.operators.advanced",
    "lakefs_iceberg_catalog_spark.operators.sources",
    "lakefs_iceberg_catalog_spark.operators.dedup",
    "lakefs_iceberg_catalog_spark.operators.similarity",
    "lakefs_iceberg_catalog_spark.operators.text",
    "lakefs_iceberg_catalog_spark.operators.multimodal",
    "lakefs_iceberg_catalog_spark.operators.pipeline",
    "lakefs_iceberg_catalog_spark.operators.versioned",
    "lakefs_iceberg_catalog_spark.operators.versioned_dml",
    "lakefs_iceberg_catalog_spark.streaming.batch_equiv",
]


def register(name: str, oracle: str | None = None):
    """Decorator: register a query callable (and its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's per-round correctness sweep checks the FIRST 50 keys in
# ``queries()`` iteration order.  Registration order is a module-import
# artifact, so we pin an explicit priority: keys that only the driver can
# hard-verify (versioned catalog, DML, Ring C, streaming, source round-trips)
# come first; the classic relational/join/window/scalar keys — all already
# driver-green in round 1 and replayed by tests/test_oracle.py every run —
# ride the later slots.  Keys absent from this list keep registration order
# after the listed ones; listed-but-unregistered names are ignored.
_SWEEP_PRIORITY = [
    # Round-3 rotation (VERDICT r2 "Next round" #1): the 11 keys that had
    # never produced a driver CORRECTNESS row ride slots 0-10 ...
    "q5_local_supplier", "q10_returned_items", "q14_promo_share",
    "q18_large_volume", "agg_rollup", "window_range_frame", "unpivot_stack",
    "join_salted_skew", "multimodal_resize", "multimodal_feature_extract",
    "pipeline_corpus_mixture",
    # ... followed by the keys NEW in round 3 ...
    "ddl_schema_evolution", "dml_delete_where_mor", "dml_update_where_mor",
    "similarity_ann_lsh_multiprobe", "q6_forecast_revenue",
    "sink_clustered_pruning",
    # ... and the two whose OUTPUT changed in round 3 (k-means-fitted IVF
    # centroids replaced the seed vectors) — they need fresh driver rows
    "similarity_ann_ivf", "dedup_embedding_cosine",
    # Ring B: versioned catalog + DML (reference's own E2E surface)
    "source_rows", "sink_create_table_as", "ddl_create_table", "sink_append",
    "dml_insert_values", "dml_delete_where", "branch_diff_equal",
    "branch_merge", "branch_wap_publish", "ddl_schema_crud",
    "dml_update_where", "dml_merge_upsert", "sql_merge_into",
    "sql_use_namespace", "time_travel_scan",
    # Ring C representatives (every family stays driver-covered)
    "dedup_exact", "dedup_near_minhash", "dedup_ngram_jaccard",
    "dedup_simhash_pairs", "dedup_cc_canonical",
    "similarity_topk", "similarity_ann_lsh", "similarity_pairs_blocked",
    "text_pii_scrub",
    "multimodal_decode", "multimodal_frame_sample",
    "pipeline_training_corpus", "sample_stratified_hash",
    # Streaming representatives (all eight were driver-green in r2; the
    # displaced ones are replayed by tests/test_oracle.py every run)
    "stream_sink_versioned", "stream_stateful", "stream_watermark_late_data",
    "stream_tumbling_window",
    # Source/sink round-trip representatives
    "source_csv_roundtrip", "sink_partitioned_parquet",
    # Displaced but still prioritized ahead of registration order: keys with
    # exactly one prior driver-green round, then the twice-green remainder.
    "stream_sliding_window", "stream_session_window", "stream_dedup",
    "stream_stream_interval_join", "join_anti", "set_except",
    "source_json_roundtrip", "source_orc_roundtrip", "dedup_simhash",
    "text_stats", "text_lang_id", "text_token_count", "text_fingerprint",
    "text_quality_filter",
    "flagship_top_unshipped", "q1_pricing_summary", "join_asof",
    "window_rank", "scalar_json", "udaf_pandas", "agg_grouping_sets",
    "subquery_correlated",
]


def _apply_sweep_priority() -> None:
    """Rebuild QUERIES/ORACLES in sweep-priority order (dicts keep insertion
    order, and ``__spark_entry__.queries()`` returns QUERIES as-is)."""
    ordered = [k for k in _SWEEP_PRIORITY if k in QUERIES]
    ordered += [k for k in QUERIES if k not in set(ordered)]
    for d in (QUERIES, ORACLES):
        snapshot = {k: d[k] for k in ordered if k in d}
        d.clear()
        d.update(snapshot)


def load_all() -> None:
    """Import every operator module (idempotent) so the registry is full."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Modules land incrementally across build rounds; missing ones are
            # simply not yet implemented.
            if e.name and not e.name.startswith("lakefs_iceberg_catalog_spark"):
                raise
    _apply_sweep_priority()

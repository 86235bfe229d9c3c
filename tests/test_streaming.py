"""Streaming semantics beyond the oracle hash-match: watermark withholds the
trailing window, sessions never overlap, streaming dedup state behaves."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakefs_iceberg_catalog_spark import registry
from lakefs_iceberg_catalog_spark.tables import table

from .conftest import SF_DIR

registry.load_all()


def test_watermark_withholds_trailing_windows(spark):
    streamed = registry.QUERIES["stream_watermark_late_data"](spark, SF_DIR)
    batch = registry.QUERIES["stream_tumbling_window"](spark, SF_DIR)
    n_stream, n_batch = streamed.count(), batch.count()
    assert n_stream < n_batch  # at least the unfinalized tail is withheld
    # everything emitted is finalized: window_end <= max_ts - delay
    mx = table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    late = streamed.filter(
        F.col("window_start") + F.expr("INTERVAL 10 MINUTES")
        > F.lit(mx) - F.expr("INTERVAL 10 MINUTES")
    )
    assert late.count() == 0


def test_sessions_disjoint_per_user(spark):
    out = registry.QUERIES["stream_session_window"](spark, SF_DIR).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.session_start)
    e = table(spark, SF_DIR, "events")
    n_events = e.count()
    assert sum(r.n_events for r in out) == n_events  # partition of all events
    for starts in by_user.values():
        assert len(starts) == len(set(starts))  # no duplicate session starts


def test_stream_dedup_is_exact_key_set(spark):
    got = {
        (r.user_id, r.event_type)
        for r in registry.QUERIES["stream_dedup"](spark, SF_DIR).collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in table(spark, SF_DIR, "events").select("user_id", "event_type").distinct().collect()
    }
    assert got == want

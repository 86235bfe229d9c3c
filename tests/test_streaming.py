"""Streaming semantics beyond the oracle hash-match: watermark withholds the
trailing window, sessions never overlap, streaming dedup state behaves."""

from __future__ import annotations

import pytest

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


def test_multibatch_watermark_and_checkpoint_recovery(spark, tmp_path):
    """Genuine incremental streaming: events split into 4 time-ordered files
    processed one per microbatch (watermark advances per batch), with a
    checkpointed query stopped mid-stream and restarted — append mode must
    emit every finalized window exactly once ACROSS the restart, matching
    the batch tumbling aggregate filtered to the final watermark."""
    import time as _time

    e = table(spark, SF_DIR, "events").select("ts", "event_type").orderBy("ts")
    rows = e.collect()
    quarters = [rows[i * len(rows) // 4 : (i + 1) * len(rows) // 4] for i in range(4)]
    src = tmp_path / "in"
    src.mkdir()
    staged = []
    for i, chunk in enumerate(quarters):
        part = tmp_path / f"stage{i}"
        spark.createDataFrame(chunk, e.schema).coalesce(1).write.mode("overwrite").parquet(str(part))
        pq = next(p for p in part.iterdir() if p.name.endswith(".parquet"))
        staged.append((pq, src / f"{i:02d}.parquet"))

    ckpt = str(tmp_path / "ckpt")
    sink: list[tuple] = []  # foreachBatch is the fault-tolerant sink path
                            # (memory sink refuses checkpoint recovery)

    def start(n_files_visible):
        for pq, dst in staged[:n_files_visible]:
            if not dst.exists():
                pq.rename(dst)
                _time.sleep(0.05)  # distinct mtimes → deterministic file order
        s = (
            spark.readStream.schema(e.schema).format("parquet")
            .option("maxFilesPerTrigger", "1").load(str(src))
        )
        agg = (
            s.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
        )
        return (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, epoch: sink.extend(tuple(r) for r in df.collect()))
            .option("checkpointLocation", ckpt).start()
        )

    q1 = start(2)
    q1.processAllAvailable()
    q1.stop()

    q2 = start(4)
    q2.processAllAvailable()
    q2.stop()

    emitted = list(sink)
    # at-least-once across the restart boundary, but a finalized window must
    # never be emitted twice with different values
    assert len({(ws, et) for ws, et, _ in emitted}) == len(set(emitted))

    import datetime

    mx = table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    expected = {
        tuple(r)
        for r in (
            table(spark, SF_DIR, "events")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("w.end") <= mx - datetime.timedelta(minutes=10))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
            .collect()
        )
    }
    assert set(emitted) == expected


def test_stream_stream_interval_join_consistent_with_batch(spark):
    streamed = {
        (r.p_id, r.s_id)
        for r in registry.QUERIES["stream_stream_interval_join"](spark, SF_DIR).collect()
    }
    e = table(spark, SF_DIR, "events")
    p = e.filter("event_type = 'purchase'").selectExpr(
        "event_id AS p_id", "user_id AS p_user", "ts AS p_ts"
    )
    s = e.filter("event_type = 'signup'").selectExpr(
        "event_id AS s_id", "user_id AS s_user", "ts AS s_ts"
    )
    batch = {
        (r.p_id, r.s_id)
        for r in p.join(
            s,
            F.expr("p_user = s_user AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR"),
        ).collect()
    }
    assert streamed, "stream-stream join emitted nothing"
    assert streamed <= batch  # never invents pairs
    # all pairs older than the watermark horizon must have been emitted
    import datetime

    mx = e.agg(F.max("ts")).collect()[0][0]
    horizon = mx - datetime.timedelta(minutes=70)  # interval + watermark delay
    old_batch = {
        (r.p_id, r.s_id)
        for r in p.join(
            s,
            F.expr("p_user = s_user AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR"),
        )
        .filter(F.col("p_ts") < F.lit(horizon))
        .collect()
    }
    assert old_batch <= streamed


def test_stream_sink_versioned_epochs_and_idempotence(spark, tmp_path):
    """The versioned streaming sink commits one snapshot per epoch (create +
    3 micro-batches = 4 versions), stamps the last epoch id, and refuses a
    replayed or older epoch without changing table state."""
    from lakefs_iceberg_catalog_spark.catalog import VersionedCatalog

    cat = VersionedCatalog(spark, str(tmp_path))
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.s")
    cat.create_table("repo.main.s.t", "k int, v string")
    for epoch in range(3):
        df = spark.createDataFrame([(epoch, f"e{epoch}")], "k int, v string")
        assert cat.append_stream_batch("repo.main.s.t", df, epoch)
    assert cat.table_history("repo.main.s.t") == [1, 2, 3, 4]
    stale = spark.createDataFrame([(99, "dup")], "k int, v string")
    assert not cat.append_stream_batch("repo.main.s.t", stale, 2)  # replay
    assert not cat.append_stream_batch("repo.main.s.t", stale, 0)  # older
    assert cat.table_history("repo.main.s.t") == [1, 2, 3, 4]
    assert cat.scan("repo.main.s.t").count() == 3


def test_stream_batch_alignment_by_name_and_strictness(spark, tmp_path):
    """append_stream_batch aligns batches BY NAME: a reordered batch casts
    into the right fields, and a misnamed/short batch raises instead of being
    positionally committed into the wrong columns (round-2 ADVICE)."""
    from lakefs_iceberg_catalog_spark.catalog import SchemaMismatchError, VersionedCatalog

    cat = VersionedCatalog(spark, str(tmp_path))
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.s")
    cat.create_table("repo.main.s.t", "k int, v string")
    # reordered columns, same names → by-name alignment
    reordered = spark.createDataFrame([("a", 1)], "v string, k int")
    assert cat.append_stream_batch("repo.main.s.t", reordered, 0)
    assert [(r.k, r.v) for r in cat.scan("repo.main.s.t").collect()] == [(1, "a")]
    # misnamed column → refused, no commit
    misnamed = spark.createDataFrame([(2, "b")], "k int, wrong string")
    with pytest.raises(SchemaMismatchError):
        cat.append_stream_batch("repo.main.s.t", misnamed, 1)
    # missing column → refused (zip truncation would have silently dropped it)
    short = spark.createDataFrame([(3,)], "k int")
    with pytest.raises(SchemaMismatchError):
        cat.append_stream_batch("repo.main.s.t", short, 1)
    assert cat.scan("repo.main.s.t").count() == 1


def test_stream_sink_epoch_race_single_winner(spark, tmp_path):
    """Zombie-writer scenario: N drivers race the SAME epoch concurrently.
    Exactly one append commits; every loser refuses after refreshing (the
    epoch stamp it re-reads covers the batch), and the table holds exactly
    one copy of the batch."""
    import threading

    from lakefs_iceberg_catalog_spark.catalog import VersionedCatalog

    cat = VersionedCatalog(spark, str(tmp_path))
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.s")
    cat.create_table("repo.main.s.t", "k int, v string")
    df = spark.createDataFrame([(1, "once")], "k int, v string")
    results = []

    def attempt():
        results.append(cat.append_stream_batch("repo.main.s.t", df, 0))

    threads = [threading.Thread(target=attempt) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == [False, False, False, True]
    assert cat.scan("repo.main.s.t").count() == 1

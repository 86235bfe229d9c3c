"""Streaming surface exposed as driver-checkable queries (SURVEY.md §2.2
stream_* keys).

Window-function keys (tumbling/sliding/session) run the SAME window
expressions in batch mode — Spark's window()/session_window() are
mode-agnostic, so the batch result IS the streaming semantics on a closed
input, and DuckDB can replay them via time_bucket / gap-sessionization.

The genuinely streaming keys (watermark late-data, dedup, stateful) run a
real readStream→memory-sink query inside the callable; their oracles encode
the deterministic closed-input outcome (e.g. append-mode emits exactly the
windows finalized by the final watermark = max(ts) - delay).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.util import dround
from ..registry import register
from ..tables import table
from .core import run_events_stream, spool_frames
from ..operators.util import local_df


@register(
    "stream_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       event_type,
       count(*)              AS n,
       round(sum(value), 2)  AS total_value
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (10 min) per event type. window() is the
    same expression streaming uses; on a closed input batch==streaming-final.
    State at scale: one row per (window, type), dropped at watermark."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dround(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@register(
    "stream_sliding_window",
    oracle="""
WITH slid AS (
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type, value FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type, value FROM events
)
SELECT ws AS window_start, event_type,
       count(*)             AS n,
       round(sum(value), 2) AS total_value
FROM slid
GROUP BY 1, 2
""",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): every event lands in
    exactly 2 epoch-aligned windows — the oracle replays that as a 2-way
    shifted-bucket union."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dround(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@register(
    "stream_session_window",
    oracle="""
WITH o AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT user_id, ts, value,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM o
)
SELECT user_id,
       min(ts)              AS session_start,
       count(*)             AS n_events,
       round(max(value), 2) AS max_value
FROM s
GROUP BY user_id, sid
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30 min gap) per user — session_window() merges events
    whose gap ≤ 30 min; the oracle sessionizes via lag+gap+cumsum, the
    batch-SQL dual of the same semantics. State at scale: one open session
    per active user, closed by watermark."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dround(F.max("value"), 2).alias("max_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "max_value")
    )


@register(
    "stream_watermark_late_data",
    oracle="""
WITH agg AS (
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
)
SELECT window_start, event_type, n
FROM agg
WHERE window_start + INTERVAL '10 minutes'
      <= (SELECT max(ts) FROM events) - INTERVAL '10 minutes'
""",
)
def stream_watermark_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run: tumbling aggregation with a 10-min watermark in
    append mode. Append emits a window only once the watermark passes its
    end, so on a closed input the result is exactly the windows with
    end ≤ max(ts) − 10 min — which is what the oracle states. The trailing
    (unfinalized) window is correctly withheld: that's the late-data
    semantics under test."""
    def xform(s):
        return (
            s.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
        )

    return run_events_stream(spark, sf_dir, xform, mode="append")


@register(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run: dropDuplicates on (user_id, event_type) — emits
    each key's first arrival; projecting the key columns makes the result
    the distinct key set. At scale the watermarked variant
    (dropDuplicatesWithinWatermark) bounds the state to the horizon."""
    def xform(s):
        return s.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])

    return run_events_stream(spark, sf_dir, xform, mode="append")


@register(
    "stream_stateful",
    oracle="""
SELECT user_id,
       count(*)             AS n_events,
       round(max(value), 2) AS max_value,
       round(min(value), 2) AS min_value
FROM events
GROUP BY user_id
""",
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run: custom per-user state machine via
    applyInPandasWithState (count + running max/min), emitting the updated
    totals at each trigger. On the single-batch closed input the emitted
    state equals the full per-user aggregate — the oracle. max/min are
    order-free so the state is engine-exact."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        n, mx, mn = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            bmx, bmn = float(pdf["value"].max()), float(pdf["value"].min())
            mx = bmx if mx is None else max(mx, bmx)
            mn = bmn if mn is None else min(mn, bmn)
        state.update((n, mx, mn))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [round(mx, 2)], "min_value": [round(mn, 2)]}
        )

    def xform(s):
        return s.groupBy("user_id").applyInPandasWithState(
            fn,
            "user_id long, n_events long, max_value double, min_value double",
            "n long, mx double, mn double",
            "append",
            GroupStateTimeout.NoTimeout,
        )

    return run_events_stream(spark, sf_dir, xform, mode="append")


@register(
    "stream_stream_interval_join",
    oracle="""
WITH p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
s AS (SELECT event_id AS s_id, user_id AS s_user, ts AS s_ts
      FROM events WHERE event_type = 'signup')
SELECT p_id, p_user, p_ts, s_id, s_ts
FROM p JOIN s ON p_user = s_user
             AND s_ts <= p_ts
             AND s_ts >= p_ts - INTERVAL 1 HOUR
""",
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream inner join: purchases joined to the same user's
    signups within the preceding hour, both sides watermarked (10 min) with
    an event-time range condition — the constraint that lets Spark bound
    join state and drop old rows.

    The harness stages the closed input as a single source file (one
    trigger), so no state is evicted before its matches arrive and the
    append-mode emission equals the batch interval join exactly — which is
    the DuckDB oracle (the key was rows-only before this equivalence was
    pinned). Multi-trigger incremental behavior — consistency across
    restarts, watermark-bounded state — is asserted separately in
    tests/test_streaming.py. At 100 TB the join state is
    (watermark + interval) per user — bounded, unlike an unconstrained
    stream-stream join which would buffer both streams forever."""
    def xform(s):
        purchases = (
            s.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("p_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        signups = (
            s.filter(F.col("event_type") == "signup")
            .select(
                F.col("event_id").alias("s_id"),
                F.col("user_id").alias("s_user"),
                F.col("ts").alias("s_ts"),
            )
            .withWatermark("s_ts", "10 minutes")
        )
        return purchases.join(
            signups,
            F.expr(
                """
                p_user = s_user AND
                s_ts <= p_ts AND
                s_ts >= p_ts - INTERVAL 1 HOUR
                """
            ),
        ).select("p_id", "p_user", "p_ts", "s_id", "s_ts")

    return run_events_stream(spark, sf_dir, xform, mode="append")


@register(
    "stream_sink_versioned",
    oracle="""
SELECT event_id, user_id, ts, round(value, 2) AS value_r
FROM events WHERE event_type = 'click'
""",
)
def stream_sink_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sink INTO the versioned catalog: readStream over the events
    source (3 staged files, maxFilesPerTrigger=1 → 3 real micro-batches) →
    filter clicks → foreachBatch appending each epoch through
    VersionedCatalog.append_stream_batch, which commits the batch's files and
    the epoch stamp in ONE atomic manifest commit. Inside the sink every
    batch is immediately replayed and must be refused — the exactly-once
    guard is part of the checked result (a double-applied batch would break
    the row-count and hash match against the oracle).

    This is the reference stack's Iceberg streaming-write path
    (commit-coordinated snapshots per epoch) re-expressed over this engine's
    manifest protocol. At 100 TB the sink cost per epoch is the appended
    files + one manifest swap; the idempotence check is a property read —
    no table scan."""
    import shutil
    import tempfile

    from ..catalog import VersionedCatalog
    from ..operators.util import dround as _dr

    e = table(spark, sf_dir, "events")  # ts already normalized to micros
    staged = tempfile.mkdtemp(prefix="events-epochs-")
    root = tempfile.mkdtemp(prefix="vcat-stream-")
    try:
        e.repartition(3).write.mode("overwrite").parquet(staged)
        cat = VersionedCatalog(spark, root)
        cat.create_repository("repo", "main")
        cat.create_namespace("repo.main.stream")
        cat.create_table(
            "repo.main.stream.clicks",
            "event_id bigint, user_id bigint, ts timestamp, value double",
        )
        s = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(staged)
        )
        out = s.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"
        )

        def sink(batch_df, batch_id):
            # side-effects must NOT live in assert statements (stripped under
            # python -O — the sink would silently commit nothing); call
            # unconditionally and raise explicitly on a broken guarantee
            if not cat.append_stream_batch("repo.main.stream.clicks", batch_df, batch_id):
                raise RuntimeError(f"epoch {batch_id} refused on first apply")
            # crash-replay of the same epoch: must be refused, not re-applied
            if cat.append_stream_batch("repo.main.stream.clicks", batch_df, batch_id):
                raise RuntimeError(f"epoch {batch_id} replay was re-applied")

        q = out.writeStream.foreachBatch(sink).outputMode("append").start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        res = cat.scan("repo.main.stream.clicks").select(
            "event_id", "user_id", "ts", _dr("value", 2).alias("value_r")
        )
        from ..operators.util import bounded_rows

        rows, schema = bounded_rows(res), res.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_cdc_apply",
    oracle="""
SELECT * FROM (VALUES
  ('2', 'Michael', 'Rose',     99, 'M'),
  ('3', 'Robert',  'Williams', 41, 'M'),
  ('4', 'Maria',   'Jones',    36, 'F'),
  ('6', 'Monika',  'Geller',   31, 'F'),
  ('7', 'Jhon',    'Smith',    50, 'M')
) AS t(id, firstname, lastname, age, gender)
""",
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply stream → versioned table: a change log (op I/U/D + full
    payload) staged as 3 epoch files streams through readStream with
    maxFilesPerTrigger=1, and foreachBatch folds each epoch into the table
    via apply_cdc_batch — every touched key's old row dropped, non-delete
    payloads inserted, and the epoch stamp committed in the SAME manifest
    swap. Inside the sink every epoch is immediately replayed and must be
    refused (exactly-once), and epoch ORDER matters: a key updated then
    deleted across epochs must end deleted. The oracle is the final state
    after the whole log.

    This is the lakehouse CDC-merge pattern (Debezium → MERGE per epoch)
    on this engine's manifest protocol."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..catalog import VersionedCatalog

    cdc_schema = T.StructType.fromDDL(
        "epoch int, op string, id string, firstname string, lastname string, "
        "age int, gender string"
    )
    log = [
        # epoch 0: initial snapshot inserts
        (0, "I", "1", "James", "Smith", 32, "M"),
        (0, "I", "2", "Michael", "Rose", 35, "M"),
        (0, "I", "3", "Robert", "Williams", 41, "M"),
        (0, "I", "4", "Maria", "Jones", 36, "F"),
        (0, "I", "5", "Jen", "Brown", 44, "F"),
        (0, "I", "6", "Monika", "Geller", 31, "F"),
        # epoch 1: update 2, delete 5, insert 7
        (1, "U", "2", "Michael", "Rose", 99, "M"),
        (1, "D", "5", "Jen", "Brown", 44, "F"),
        (1, "I", "7", "Jhon", "Smith", 33, "M"),
        # epoch 2: update 7, delete 1
        (2, "U", "7", "Jhon", "Smith", 50, "M"),
        (2, "D", "1", "James", "Smith", 32, "M"),
    ]
    staged = tempfile.mkdtemp(prefix="cdc-epochs-")
    root = tempfile.mkdtemp(prefix="vcat-cdc-")
    try:
        full = local_df(spark, log, cdc_schema)
        for ep in (0, 1, 2):
            # one file per epoch, written in order so the file stream
            # replays the log deterministically (lexicographic pickup)
            full.filter(F.col("epoch") == ep).drop("epoch").coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{staged}/ep{ep}")
        cat = VersionedCatalog(spark, root)
        cat.create_repository("repo", "main")
        cat.create_namespace("repo.main.cdc")
        t = "repo.main.cdc.workers"
        cat.create_table(
            t,
            "id string, firstname string, lastname string, age int, gender string",
        )
        change_schema = T.StructType.fromDDL(
            "op string, id string, firstname string, lastname string, "
            "age int, gender string"
        )
        s = (
            spark.readStream.schema(change_schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(staged + "/ep*")
        )

        def sink(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            if not cat.apply_cdc_batch(t, batch_df, ["id"], batch_id):
                raise RuntimeError(f"epoch {batch_id} refused on first apply")
            if cat.apply_cdc_batch(t, batch_df, ["id"], batch_id):
                raise RuntimeError(f"epoch {batch_id} replay was re-applied")

        q = s.writeStream.foreachBatch(sink).outputMode("append").start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        res = cat.scan(t)
        from ..operators.util import bounded_rows

        rows, schema = bounded_rows(res), res.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_static_join",
    oracle="""
SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, round(e.value, 2) AS value_r
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
""",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static enrichment join: the events stream joined to the
    static customer dimension — the canonical streaming-ETL shape (enrich
    each event with its dimension row on arrival). The static side needs no
    watermark and holds no state: Spark broadcasts it to every micro-batch,
    so at 100 TB of stream the per-trigger cost is the batch's rows × a
    hash-map probe, never a stateful shuffle. Closed-input append-mode
    emission equals the batch join — the DuckDB oracle."""
    dim = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )

    def xform(s):
        return (
            s.filter(F.col("event_type") == "purchase")
            .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
            .select(
                "event_id",
                "user_id",
                "c_name",
                "c_mktsegment",
                dround("value", 2).alias("value_r"),
            )
        )

    return run_events_stream(spark, sf_dir, xform, mode="append")


@register(
    "stream_stream_outer_join",
    oracle="""
WITH p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
s AS (SELECT event_id AS s_id, user_id AS s_user, ts AS s_ts
      FROM events WHERE event_type = 'signup'),
wm AS (SELECT least((SELECT max(p_ts) FROM p), (SELECT max(s_ts) FROM s))
              - INTERVAL 10 MINUTE AS w)
SELECT p_id, p_user, p_ts, s_id, s_ts
FROM p JOIN s ON p_user = s_user
             AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR
UNION ALL
SELECT p_id, p_user, p_ts, NULL, NULL
FROM p, wm
WHERE p_ts < wm.w
  AND NOT EXISTS (SELECT 1 FROM s WHERE s_user = p_user
                  AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR)
""",
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream LEFT OUTER interval join: purchases with their
    preceding-hour signup, or NULLs once the join state can PROVE no match
    is coming. The null side is where streaming semantics genuinely differ
    from batch: an unmatched purchase emits only after the query watermark
    (min of both sides' watermarks, 10 min delay) passes its event time —
    before that the row sits in state awaiting a possible late signup. The
    oracle encodes exactly that closure: matched rows unconditionally,
    unmatched only where p_ts < min(max p_ts, max s_ts) − 10 min — verified
    emission-exact against Spark's state eviction (1951 of 1952 unmatched
    rows close on the fixture; the newest stays buffered). At 100 TB the
    state bound is (watermark + interval) per key on both sides, and the
    watermark is also the REPLAYABILITY contract: any restart emits the
    same closed rows."""
    def xform(s):
        purchases = (
            s.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("p_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "10 minutes")
        )
        signups = (
            s.filter(F.col("event_type") == "signup")
            .select(
                F.col("event_id").alias("s_id"),
                F.col("user_id").alias("s_user"),
                F.col("ts").alias("s_ts"),
            )
            .withWatermark("s_ts", "10 minutes")
        )
        return purchases.join(
            signups,
            F.expr(
                """
                p_user = s_user AND
                s_ts <= p_ts AND
                s_ts >= p_ts - INTERVAL 1 HOUR
                """
            ),
            "left_outer",
        ).select("p_id", "p_user", "p_ts", "s_id", "s_ts")

    return run_events_stream(spark, sf_dir, xform, mode="append")


@register(
    "stream_source_versioned",
    oracle="""
SELECT user_id, count(*) AS n_clicks, round(sum(value), 2) AS total_value
FROM events WHERE event_type = 'click'
GROUP BY user_id
""",
)
def stream_source_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned table as a STREAMING SOURCE (Iceberg's streaming read /
    Delta's readStream on a table): three committed append snapshots replay
    in commit order as micro-batches. Each epoch's rows come from
    ``table_changes(v-1, v)`` — the incremental append scan, reading ONLY
    the files that snapshot added — spooled in snapshot order and consumed
    by a real Structured Streaming query (maxFilesPerTrigger=1 → one epoch
    per snapshot, asserted), which accumulates rows exactly-once into the
    result. The aggregation runs on the accumulated rows afterwards, so the
    check is row-for-row against the raw-events oracle.

    Scale: per-epoch IO is the snapshot delta (table_changes raises on
    non-append ranges rather than silently rescanning); the spool is the
    checkpointed offset log's analog — at deployment the source tracks the
    last-read snapshot id in the stream checkpoint and resumes from there,
    the exact Iceberg streaming-read contract."""
    import os
    import shutil
    import tempfile

    from ..catalog import VersionedCatalog

    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    root = tempfile.mkdtemp(prefix="vcat-streamsrc-")
    spool = tempfile.mkdtemp(prefix="vcat-spool-")
    sink_dir = tempfile.mkdtemp(prefix="vcat-sink-")
    try:
        cat = VersionedCatalog(spark, root)
        cat.create_repository("repo", "main")
        cat.create_namespace("repo.main.stream")
        t = "repo.main.stream.clicks"
        cat.create_table(t, "event_id bigint, user_id bigint, ts timestamp, value double")
        # three append snapshots (v2, v3, v4) staged by ONE write job
        cat.append_many(t, [e.filter(F.col("event_id") % 3 == i) for i in range(3)])
        # replay each snapshot's delta, in commit order, as ONE spool file
        # per epoch (all staged by a single job — core.spool_frames)
        spool_frames(
            [cat.table_changes(t, v - 1, v) for v in range(2, 5)],
            spool,
            [f"epoch-{v}.parquet" for v in range(2, 5)],
        )
        s = (
            spark.readStream.schema(
                "event_id bigint, user_id bigint, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(spool)
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", os.path.join(sink_dir, "data"))
            .option("checkpointLocation", os.path.join(sink_dir, "ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_epochs = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        finally:
            q.stop()
        assert n_epochs == 3, f"expected one micro-batch per snapshot, got {n_epochs}"
        acc = spark.read.schema(
            "event_id bigint, user_id bigint, ts timestamp, value double"
        ).parquet(os.path.join(sink_dir, "data"))
        out = acc.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_clicks"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        from ..operators.util import bounded_rows

        rows, schema = bounded_rows(out), out.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(spool, ignore_errors=True)
        shutil.rmtree(sink_dir, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_source_delta",
    oracle="""
SELECT user_id, count(*) AS n_clicks, round(sum(value), 2) AS total_value
FROM events WHERE event_type = 'click'
GROUP BY user_id
""",
)
def stream_source_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Delta log as a STREAMING SOURCE (stock Delta's readStream on
    a table): the initial micro-batch is the full snapshot at the stream's
    starting version (version 0), and every later commit replays as one
    micro-batch of exactly its CDF inserts (``delta_table_changes(v-1,
    v)`` — a metadata-only log diff reading only the files that commit
    added). The epochs spool in commit order and feed a real Structured
    Streaming query (maxFilesPerTrigger=1 → one epoch per commit,
    asserted), accumulating rows exactly-once; the aggregation then runs
    over the accumulated rows, row-for-row against the raw-events oracle.
    The open-format interop twin of stream_source_versioned.

    Scale: per-epoch IO is the commit's delta, never a table rescan —
    the log fold is metadata-only; at deployment the stream checkpoint
    records the last-read version and resumes from there, exactly stock
    Delta's streaming-source offset contract."""
    import os
    import shutil
    import tempfile

    from ..catalog.delta_format import DeltaTableWriter, delta_table_changes
    from ..catalog.delta_format import scan_delta_table

    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    root = tempfile.mkdtemp(prefix="delta-streamsrc-")
    spool = tempfile.mkdtemp(prefix="delta-spool-")
    sink_dir = tempfile.mkdtemp(prefix="delta-sink-")
    try:
        w = DeltaTableWriter(spark, root)
        # three append commits (versions 0, 1, 2) staged in one job
        w.commit_many([e.filter(F.col("event_id") % 3 == i) for i in range(3)])
        deltas = []
        # the pure-inserts invariant rides the ONE spool write job as
        # observed metrics instead of paying a count action per version
        # (§1.2); the checked semantics are identical — same assert,
        # evaluated once the spool job (which scans every change row)
        # has run
        from pyspark.sql import Observation

        insert_checks: list[Observation] = []
        for v in range(3):
            if v == 0:
                delta = scan_delta_table(spark, root, version=0)
            else:
                changes = delta_table_changes(spark, root, v - 1, v)
                o = Observation()
                changes = changes.observe(
                    o,
                    F.sum(
                        F.when(
                            F.col("_change_type") != "insert", 1
                        ).otherwise(0)
                    ).alias("non_insert"),
                )
                insert_checks.append(o)
                delta = changes.drop("_change_type")
            deltas.append(delta)
        spool_frames(deltas, spool, [f"epoch-{v}.parquet" for v in range(3)])
        for o in insert_checks:
            assert not (
                o.get["non_insert"] or 0
            ), "append-only history must replay as pure inserts"
        s = (
            spark.readStream.schema(
                "event_id bigint, user_id bigint, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(spool)
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", os.path.join(sink_dir, "data"))
            .option("checkpointLocation", os.path.join(sink_dir, "ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_epochs = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        finally:
            q.stop()
        assert n_epochs == 3, f"expected one micro-batch per commit, got {n_epochs}"
        acc = spark.read.schema(
            "event_id bigint, user_id bigint, ts timestamp, value double"
        ).parquet(os.path.join(sink_dir, "data"))
        out = acc.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_clicks"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        from ..operators.util import bounded_rows

        rows, schema = bounded_rows(out), out.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(spool, ignore_errors=True)
        shutil.rmtree(sink_dir, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_source_iceberg",
    oracle="""
SELECT user_id, count(*) AS n_clicks, round(sum(value), 2) AS total_value
FROM events WHERE event_type = 'click'
GROUP BY user_id
""",
)
def stream_source_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Iceberg v2 layout as a STREAMING SOURCE (Iceberg's
    SparkMicroBatchStream): the initial micro-batch is the stream-start
    snapshot's full scan; every later snapshot replays as one micro-batch
    of exactly its incremental appends (``scan_iceberg_incremental(prev,
    snap)`` — one manifest walk selecting only the files that snapshot
    added, append-only range validated). Epochs spool in snapshot order
    into a real Structured Streaming query (maxFilesPerTrigger=1 → one
    epoch per snapshot, asserted) with exactly-once accumulation; the
    aggregation runs over the accumulated rows, row-for-row against the
    raw-events oracle. Completes the streaming-ingest story for BOTH open
    table formats (pair of stream_source_delta).

    Scale: per-epoch IO is the snapshot's appended files only — the
    manifest walk is metadata-sized; at deployment the stream checkpoint
    records the last-consumed snapshot id, Iceberg's streaming-read
    offset contract."""
    import os
    import shutil
    import tempfile

    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        scan_iceberg_incremental,
        scan_iceberg_table,
    )

    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    root = tempfile.mkdtemp(prefix="iceberg-streamsrc-")
    spool = tempfile.mkdtemp(prefix="iceberg-spool-")
    sink_dir = tempfile.mkdtemp(prefix="iceberg-sink-")
    try:
        w = IcebergTableWriter(spark, root)
        snaps = w.append_many(
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
        )
        spool_frames(
            [
                scan_iceberg_table(spark, root, snapshot_id=snap)
                if i == 0
                else scan_iceberg_incremental(spark, root, snaps[i - 1], snap)
                for i, snap in enumerate(snaps)
            ],
            spool,
            [f"epoch-{i}.parquet" for i in range(len(snaps))],
        )
        s = (
            spark.readStream.schema(
                "event_id bigint, user_id bigint, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(spool)
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", os.path.join(sink_dir, "data"))
            .option("checkpointLocation", os.path.join(sink_dir, "ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_epochs = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        finally:
            q.stop()
        assert n_epochs == 3, f"expected one micro-batch per snapshot, got {n_epochs}"
        acc = spark.read.schema(
            "event_id bigint, user_id bigint, ts timestamp, value double"
        ).parquet(os.path.join(sink_dir, "data"))
        out = acc.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_clicks"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        from ..operators.util import bounded_rows

        rows, schema = bounded_rows(out), out.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(spool, ignore_errors=True)
        shutil.rmtree(sink_dir, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_sink_iceberg",
    oracle="""
SELECT user_id, count(*) AS n_clicks, round(sum(value), 2) AS total_value
FROM events WHERE event_type = 'click'
GROUP BY user_id
""",
)
def stream_sink_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sink INTO a real Iceberg v2 layout with exactly-once
    epochs — the symmetric key to stream_sink_delta: readStream over
    staged epochs (3 real micro-batches) → foreachBatch committing each
    batch through IcebergTableWriter with ``epoch=(appId, batch_id)``,
    recorded in the snapshot SUMMARY the way Iceberg's own Spark/Flink
    sinks gate duplicate deliveries. Inside the sink every epoch is
    immediately REDELIVERED and must be a no-op (asserted): a
    double-applied batch would break the hash match against the
    raw-events oracle.

    Scale: per-epoch cost is one data file + one manifest + one
    metadata.json; idempotence is a snapshot-summary lookup — metadata,
    never a data comparison."""
    import shutil
    import tempfile

    from ..catalog.iceberg_format import IcebergTableWriter, scan_iceberg_table

    e = table(spark, sf_dir, "events")
    staged = tempfile.mkdtemp(prefix="iceberg-epochs-")
    root = tempfile.mkdtemp(prefix="iceberg-streamsink-")
    try:
        e.repartition(3).write.mode("overwrite").parquet(staged)
        w = IcebergTableWriter(spark, root)
        s = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(staged)
        )
        out = s.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"
        )

        def sink(batch_df, batch_id):
            sid = w.append(batch_df, epoch=("clicks-app", batch_id))
            # crash-replay of the same epoch: must be a no-op
            if w.append(batch_df, epoch=("clicks-app", batch_id)) != sid:
                raise RuntimeError(f"epoch {batch_id} replay was re-applied")

        q = out.writeStream.foreachBatch(sink).outputMode("append").start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        res = scan_iceberg_table(spark, root)
        out_df = res.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_clicks"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        from ..operators.util import bounded_rows

        rows, schema = bounded_rows(out_df), out_df.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_sink_delta",
    oracle="""
SELECT user_id, count(*) AS n_clicks, round(sum(value), 2) AS total_value
FROM events WHERE event_type = 'click'
GROUP BY user_id
""",
)
def stream_sink_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sink INTO a real Delta log with the protocol's
    exactly-once contract: readStream over staged epochs (3 real
    micro-batches) → foreachBatch committing each batch through
    DeltaTableWriter with ``txn=(appId, batch_id)`` — the `txn` action
    stock Delta sinks write. Inside the sink every epoch is immediately
    REDELIVERED and must be skipped (the log's latest txn version gates
    the commit); a double-applied batch would break the row-count/hash
    match against the raw-events oracle. txn state survives checkpoint
    truncation (checkpoints carry txn rows — unit-tested).

    Scale: per-epoch cost is the appended files plus one metadata fold;
    idempotence is a metadata lookup, never a data comparison — the
    protocol's design for resuming streams at 100 TB."""
    import os
    import shutil
    import tempfile

    from ..catalog.delta_format import DeltaTableWriter, scan_delta_table

    e = table(spark, sf_dir, "events")
    staged = tempfile.mkdtemp(prefix="delta-epochs-")
    root = tempfile.mkdtemp(prefix="delta-streamsink-")
    try:
        e.repartition(3).write.mode("overwrite").parquet(staged)
        w = DeltaTableWriter(spark, root)
        s = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(staged)
        )
        out = s.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"
        )

        def sink(batch_df, batch_id):
            v = w.commit(add_dfs=[batch_df], txn=("clicks-app", batch_id))
            # crash-replay of the same epoch: must be a no-op, not re-applied
            if w.commit(add_dfs=[batch_df], txn=("clicks-app", batch_id)) != v:
                raise RuntimeError(f"epoch {batch_id} replay was re-applied")

        q = out.writeStream.foreachBatch(sink).outputMode("append").start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        res = scan_delta_table(spark, root)
        out_df = res.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_clicks"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        from ..operators.util import bounded_rows

        rows, schema = bounded_rows(out_df), out_df.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_cdc_iceberg",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 5 THEN 'UPDATED-5' ELSE n_name END AS n_name,
       n_regionkey
FROM nation WHERE n_nationkey NOT IN (2, 14)
UNION ALL
SELECT CAST(25 AS INTEGER), 'ATLANTIS', n_regionkey
FROM nation WHERE n_nationkey = 4
""",
)
def stream_cdc_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg CHANGELOG consumed as a CDC STREAM — the composition a
    downstream mirror runs: ``scan_iceberg_changelog`` derives each
    snapshot's row-level inserts/deletes (append, MoR position delete,
    MoR merge upsert), each snapshot replays as ONE micro-batch through a
    real Structured Streaming query (maxFilesPerTrigger=1, epoch count
    asserted), and the accumulated change rows FOLD onto the stream-start
    base state — inserts union in, deletes exceptAll out — reproducing
    the table head exactly (value-checked against the oracle's literal
    replay). Extends stream_source_iceberg (append-only incremental) to
    the full CDC shape, the pair of stream_cdc_apply on the Delta/
    versioned side.

    Scale: per-epoch IO is the snapshot's change-proportional changelog
    read; the fold is one union + one anti-multiset pass over
    change-volume rows, never a table rewrite. At deployment the stream
    checkpoint records the last-consumed snapshot id."""
    import os
    import shutil
    import tempfile

    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        scan_iceberg_changelog,
        scan_iceberg_table,
    )
    from ..operators.util import bounded_rows
    from ..tables import table as _t

    n0 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    n = local_df(spark, bounded_rows(n0), n0.schema)
    root = tempfile.mkdtemp(prefix="iceberg-cdcstream-")
    spool = tempfile.mkdtemp(prefix="iceberg-cdcspool-")
    sink_dir = tempfile.mkdtemp(prefix="iceberg-cdcsink-")
    ddl = (
        "n_nationkey int, n_name string, n_regionkey int, "
        "_change_type string, _commit_seq long"
    )
    try:
        w = IcebergTableWriter(spark, root)
        # both append snapshots staged in ONE write job (append_many)
        snaps = w.append_many(
            [n.filter("n_regionkey < 2"), n.filter("n_regionkey >= 2")]
        )
        v1 = snaps[0]
        snaps.append(w.delete_where_mor("n_nationkey in (2, 14)"))
        src = n.filter("n_nationkey = 5").withColumn(
            "n_name", F.lit("UPDATED-5")
        ).unionByName(
            n.filter("n_nationkey = 4").withColumns(
                {
                    "n_nationkey": F.lit(25).cast("int"),
                    "n_name": F.lit("ATLANTIS"),
                }
            )
        )
        snaps.append(w.merge_upsert_mor(src, ["n_nationkey"]))
        base = scan_iceberg_table(spark, root, snapshot_id=v1).select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        base_rows = bounded_rows(base)
        spool_frames(
            [
                scan_iceberg_changelog(
                    spark, root, from_snapshot_id=snaps[i - 1],
                    to_snapshot_id=snaps[i],
                ).select(
                    "n_nationkey", "n_name", "n_regionkey",
                    "_change_type", "_commit_seq",
                )
                for i in range(1, len(snaps))
            ],
            spool,
            [f"epoch-{i}.parquet" for i in range(1, len(snaps))],
        )
        s = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(spool)
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", os.path.join(sink_dir, "data"))
            .option("checkpointLocation", os.path.join(sink_dir, "ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_epochs = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        finally:
            q.stop()
        assert n_epochs == len(snaps) - 1, (
            f"expected one micro-batch per snapshot, got {n_epochs}"
        )
        changes = spark.read.schema(ddl).parquet(os.path.join(sink_dir, "data"))
        cols = ["n_nationkey", "n_name", "n_regionkey"]
        base_df = local_df(spark, base_rows, base.schema)
        final = (
            base_df.unionByName(
                changes.filter("_change_type = 'insert'").select(*cols)
            ).exceptAll(changes.filter("_change_type = 'delete'").select(*cols))
        )
        rows, schema = bounded_rows(final), final.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(spool, ignore_errors=True)
        shutil.rmtree(sink_dir, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_cdc_delta",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey = 5 THEN 'UPDATED-5' ELSE n_name END AS n_name,
       n_regionkey
FROM nation WHERE n_nationkey NOT IN (2, 14)
UNION ALL
SELECT CAST(25 AS INTEGER), 'ATLANTIS', n_regionkey
FROM nation WHERE n_nationkey = 4
""",
)
def stream_cdc_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta CHANGE DATA FEED consumed as a CDC STREAM — the Delta
    pair of ``stream_cdc_iceberg``: ``delta_table_changes`` derives each
    version's row-level changes (append, deletion-vector DELETE, CoW
    MERGE upsert), each version replays as ONE micro-batch through a
    real Structured Streaming query (epoch count asserted), and the
    change rows FOLD onto the stream-start base — inserts union in,
    deletes exceptAll out. The CoW merge's rewritten file surfaces as
    full churn in the raw file-set diff (delete of the pre-image +
    insert of the post-image); the MULTISET fold nets carried-over rows
    out exactly, which is why the endpoint state still reproduces the
    table head — value-checked against the oracle's literal replay.

    Scale: per-epoch IO is the version's change-proportional CDF read
    (touched files + DV ordinals only); the fold is one union + one
    anti-multiset pass over change-volume rows. A deployment checkpoint
    records the last-consumed version."""
    import os
    import shutil
    import tempfile

    from ..catalog.delta_format import (
        DeltaTableWriter,
        delta_table_changes,
        scan_delta_table,
    )
    from ..operators.util import bounded_rows
    from ..tables import table as _t

    n0 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    n = local_df(spark, bounded_rows(n0), n0.schema)
    root = tempfile.mkdtemp(prefix="delta-cdcstream-")
    spool = tempfile.mkdtemp(prefix="delta-cdcspool-")
    sink_dir = tempfile.mkdtemp(prefix="delta-cdcsink-")
    try:
        w = DeltaTableWriter(spark, root)
        # both append versions staged in ONE write job (commit_many)
        versions = w.commit_many(
            [n.filter("n_regionkey < 2"), n.filter("n_regionkey >= 2")]
        )
        versions.append(w.delete_where_dv("n_nationkey in (2, 14)"))
        src = n.filter("n_nationkey = 5").withColumn(
            "n_name", F.lit("UPDATED-5")
        ).unionByName(
            n.filter("n_nationkey = 4").withColumns(
                {
                    "n_nationkey": F.lit(25).cast("int"),
                    "n_name": F.lit("ATLANTIS"),
                }
            )
        )
        versions.append(w.merge_upsert(src, ["n_nationkey"]))
        base = scan_delta_table(spark, root, version=versions[0])
        base_rows = bounded_rows(base)
        ch_frames = [
            delta_table_changes(
                spark, root, versions[i - 1], versions[i]
            ).select("n_nationkey", "n_name", "n_regionkey", "_change_type")
            for i in range(1, len(versions))
        ]
        ch_schema = ch_frames[-1].schema
        spool_frames(
            ch_frames, spool,
            [f"epoch-{i}.parquet" for i in range(1, len(versions))],
        )
        s = (
            spark.readStream.schema(ch_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(spool)
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", os.path.join(sink_dir, "data"))
            .option("checkpointLocation", os.path.join(sink_dir, "ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_epochs = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        finally:
            q.stop()
        assert n_epochs == len(versions) - 1, (
            f"expected one micro-batch per version, got {n_epochs}"
        )
        changes = spark.read.schema(ch_schema).parquet(
            os.path.join(sink_dir, "data")
        )
        cols = ["n_nationkey", "n_name", "n_regionkey"]
        base_df = local_df(spark, base_rows, base.schema)
        final = base_df.unionByName(
            changes.filter("_change_type = 'insert'").select(*cols)
        ).exceptAll(changes.filter("_change_type = 'delete'").select(*cols))
        rows, schema = bounded_rows(final), final.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(spool, ignore_errors=True)
        shutil.rmtree(sink_dir, ignore_errors=True)
    return local_df(spark, rows, schema)


@register(
    "stream_source_rate_limit",
    oracle="""
WITH clicks AS (
  SELECT * FROM events WHERE event_type = 'click'
)
SELECT 'iceberg' AS fmt, CAST(count(*) AS BIGINT) AS n_rows,
       3 AS n_batches, TRUE AS terminated
FROM clicks
UNION ALL
SELECT 'delta', CAST(count(*) AS BIGINT), 2, TRUE FROM clicks
""",
)
def stream_source_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING RATE LIMITS over a commit BACKLOG on both real formats
    (round 15, VERDICT r14 stretch #7 — ``maxFilesPerTrigger`` +
    ``Trigger.AvailableNow``): a stream starting against a table with
    many historical commits must drain them in BOUNDED micro-batches —
    several commits per batch under the rate limit — and then STOP,
    instead of one batch per commit (stream_source_iceberg/delta's
    shape) or one unbounded catch-up batch. The Iceberg backlog is 6
    snapshots consumed at maxFilesPerTrigger=2 → exactly 3 batches; the
    Delta backlog is 6 commits at maxFilesPerTrigger=3 → exactly 2
    batches; both queries terminate on their own (AvailableNow) —
    asserted — and the accumulated rows equal the table scan exactly
    (exactly-once across the batched catch-up).

    Scale: per-batch IO is rate-limit-bounded regardless of backlog
    depth — the 100 TB cold-start story: a new consumer against a year
    of history reads at a controlled batch size with checkpointed
    progress, never one giant batch."""
    import os
    import shutil
    import tempfile

    from ..catalog.delta_format import (
        DeltaTableWriter,
        delta_table_changes,
        scan_delta_table,
    )
    from ..catalog.iceberg_format import (
        IcebergTableWriter,
        scan_iceberg_incremental,
        scan_iceberg_table,
    )
    from ..operators.util import bounded_rows

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select("event_id", "user_id", "ts", "value")
    ddl = "event_id bigint, user_id bigint, ts timestamp, value double"
    tmp_roots: list[str] = []

    def spool_epochs(deltas, spool):
        spool_frames(
            deltas, spool,
            [f"epoch-{i}.parquet" for i in range(len(deltas))],
        )

    def drain(spool, files_per_trigger, sink_dir):
        """AvailableNow catch-up under the rate limit; returns
        (accumulated_df, n_batches, terminated)."""
        s = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(spool)
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", os.path.join(sink_dir, "data"))
            .option("checkpointLocation", os.path.join(sink_dir, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            terminated = q.awaitTermination(120)
            n_batches = len(
                [p for p in q.recentProgress if p["numInputRows"] > 0]
            )
        finally:
            q.stop()
        acc = spark.read.schema(ddl).parquet(os.path.join(sink_dir, "data"))
        return acc, n_batches, terminated

    try:
        # ---- Iceberg: 6-snapshot backlog, 2 commits per batch ----
        iroot = tempfile.mkdtemp(prefix="ice-ratelimit-")
        ispool = tempfile.mkdtemp(prefix="ice-rl-spool-")
        isink = tempfile.mkdtemp(prefix="ice-rl-sink-")
        tmp_roots += [iroot, ispool, isink]
        w = IcebergTableWriter(spark, iroot)
        snaps = w.append_many(
            [e.filter(F.col("event_id") % 6 == i) for i in range(6)]
        )
        ideltas = [scan_iceberg_table(spark, iroot, snapshot_id=snaps[0])] + [
            scan_iceberg_incremental(spark, iroot, snaps[i - 1], snaps[i])
            for i in range(1, 6)
        ]
        def bag_stats(acc, tbl) -> tuple[int, int]:
            """ONE aggregate action returning (acc row count, bag-mismatch
            group count): the exactly-once probe (accumulated ≡ table as a
            BAG) and the output's row count share a single two-level
            aggregate instead of an exceptAll-both-ways probe action plus
            a count action (§1.2). Bag semantics match the exceptAll pair:
            a row group's +1/−1 tag sum is 0 iff both sides carry it with
            the same multiplicity (NULLs/NaNs group as set ops treat
            them)."""
            cols = acc.columns
            tagged = acc.withColumn("_s", F.lit(1)).unionByName(
                tbl.select(*cols).withColumn("_s", F.lit(-1))
            )
            g = tagged.groupBy(*cols).agg(
                F.sum("_s").alias("_d"),
                F.sum(
                    F.when(F.col("_s") == 1, 1).otherwise(0)
                ).alias("_n1"),
            )
            r = bounded_rows(
                g.select(
                    F.coalesce(F.sum("_n1"), F.lit(0)).alias("n_acc"),
                    F.coalesce(
                        F.sum(F.when(F.col("_d") != 0, 1).otherwise(0)),
                        F.lit(0),
                    ).alias("bad"),
                )
            )[0]
            return int(r["n_acc"]), int(r["bad"])

        spool_epochs(ideltas, ispool)
        iacc, in_batches, iterm = drain(ispool, 2, isink)
        assert in_batches == 3, f"6 commits / 2 per trigger != {in_batches}"
        # exactly-once across the batched catch-up: accumulated == table
        in_rows, ibad = bag_stats(iacc, scan_iceberg_table(spark, iroot))
        assert ibad == 0

        # ---- Delta: 6-commit backlog, 3 commits per batch ----
        droot = tempfile.mkdtemp(prefix="delta-ratelimit-")
        dspool = tempfile.mkdtemp(prefix="delta-rl-spool-")
        dsink = tempfile.mkdtemp(prefix="delta-rl-sink-")
        tmp_roots += [droot, dspool, dsink]
        dw = DeltaTableWriter(spark, droot)
        dw.commit_many([e.filter(F.col("event_id") % 6 == i) for i in range(6)])
        ddeltas = [scan_delta_table(spark, droot, version=0)] + [
            delta_table_changes(spark, droot, v - 1, v).drop("_change_type")
            for v in range(1, 6)
        ]
        spool_epochs(ddeltas, dspool)
        dacc, dn_batches, dterm = drain(dspool, 3, dsink)
        assert dn_batches == 2, f"6 commits / 3 per trigger != {dn_batches}"
        dn_rows, dbad = bag_stats(dacc, scan_delta_table(spark, droot))
        assert dbad == 0

        out = local_df(spark,
            [
                ("iceberg", in_rows, 3, bool(iterm)),
                ("delta", dn_rows, 2, bool(dterm)),
            ],
            "fmt string, n_rows bigint, n_batches int, terminated boolean",
        )
        rows, schema = bounded_rows(out), out.schema
    finally:
        for r in tmp_roots:
            shutil.rmtree(r, ignore_errors=True)
    return local_df(spark, rows, schema)

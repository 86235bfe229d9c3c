"""Ring A — window functions: ranking (row_number/rank/dense_rank/ntile) and
analytic (lag/lead/running frames).

Scale notes (100 TB): a window = one hash shuffle on the partition key + a
per-partition sort. Partition keys here (nation, user) are high-cardinality
relative to cluster size, so work spreads evenly; a window with NO partition
key (global row_number) would serialize on one task and is deliberately
absent — global ordering needs are served by sort+limit instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from ..tables import table
from .util import dround, gated_broadcast


@register(
    "window_rank",
    oracle="""
SELECT c_nationkey,
       c_custkey,
       round(c_acctbal, 2) AS acctbal,
       row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank()       OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 2) DESC)  AS rnk,
       dense_rank() OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 2) DESC)  AS drnk,
       ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family per nation. row_number/ntile carry a unique tiebreak
    (c_custkey); rank/dense_rank rank on the rounded value so ties are
    engine-independent."""
    c = table(spark, sf_dir, "customer")
    w_unique = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_ties = W.partitionBy("c_nationkey").orderBy(dround("c_acctbal", 2).desc())
    return c.select(
        "c_nationkey",
        "c_custkey",
        dround("c_acctbal", 2).alias("acctbal"),
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_unique).alias("quartile"),
    )


@register(
    "window_analytic",
    oracle="""
SELECT event_id,
       user_id,
       ts,
       round(value, 2) AS value,
       round(lag(value)  OVER w, 2)                    AS prev_value,
       round(lead(value) OVER w, 2)                    AS next_value,
       round(sum(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
       round(avg(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running sum + 3-row moving average per user timeline.

    The total order (ts, event_id) is unique per user, so the sequential
    floating-point accumulation order is identical in both engines.
    """
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        dround("value", 2).alias("value"),
        dround(F.lag("value").over(w), 2).alias("prev_value"),
        dround(F.lead("value").over(w), 2).alias("next_value"),
        dround(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias("running_sum"),
        dround(F.avg("value").over(w.rowsBetween(-2, W.currentRow)), 4).alias("moving_avg_3"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT c_custkey,
       c_nationkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()   OVER w, 6)  AS cume,
       nth_value(c_custkey, 2) OVER w  AS second_key,
       first_value(c_custkey) OVER w   AS top_key
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 2) DESC, c_custkey)
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution family: percent_rank / cume_dist / nth_value /
    first_value per nation, over a fully deterministic (value, key) order so
    frames agree across engines."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(dround("c_acctbal", 2).desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        dround(F.percent_rank().over(w), 6).alias("pct_rank"),
        dround(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_custkey", 2).over(w).alias("second_key"),
        F.first_value("c_custkey").over(w).alias("top_key"),
    )


@register(
    "window_sessionize",
    oracle="""
WITH o AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
           event_id
    FROM events WHERE user_id < 10
),
m AS (
    SELECT user_id, ts, value, event_id,
           CASE WHEN prev_ts IS NULL
                  OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_sess
    FROM o
),
s AS (
    SELECT user_id, ts, value, event_id,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM m
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       round(sum(value), 2) AS session_value
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap-based session assignment every
    clickstream pipeline runs: a new session starts when a user's
    inter-event gap exceeds 30 minutes; session ids are the running count
    of session starts (lag + conditional cumsum), then sessions aggregate
    to (count, start, value). The streaming twin is
    stream_session_window — this is the REPROCESSING form over history.

    Scale (100 TB): one shuffle on user_id shared by the lag window, the
    cumsum window, and the final aggregate (same partitioning — Catalyst
    reuses the exchange); the event-id tiebreak makes session ids
    deterministic under equal timestamps on any engine."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = e.select(
        "user_id", "ts", "value", "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            dround(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            "n_events",
            "session_start",
            "session_value",
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "window_activity_streaks",
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
grp AS (
    SELECT user_id, d,
           d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS island
    FROM days
),
streaks AS (
    SELECT user_id, count(*) AS streak_len, min(d) AS streak_start
    FROM grp GROUP BY user_id, island
)
SELECT user_id,
       count(*)                                   AS n_streaks,
       CAST(max(streak_len) AS BIGINT)            AS longest_streak,
       CAST(min(CAST(streak_start AS VARCHAR)) AS VARCHAR) AS first_streak_start
FROM streaks
GROUP BY user_id
HAVING max(streak_len) >= 3
""",
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks — the gaps-and-islands pattern
    (retention/engagement's workhorse): one distinct (user, day) pass, the
    classic date-minus-row_number island key (consecutive days share it,
    any gap starts a new island), then per-island and per-user rollups.
    Emits users with a 3-day-or-longer streak: streak count, longest run,
    first streak's start date.

    Scale: every window and rollup partitions on user_id — fully parallel
    across users, state per task is one user's day list, no cross-user
    shuffle beyond the initial distinct. The island trick keeps it to ONE
    window pass where a self-join formulation would pair every day with
    every other."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    grp = e.select(
        "user_id", "d", F.date_sub(F.col("d"), rn).alias("island")
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("d").alias("streak_start")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("streak_len").cast("bigint").alias("longest_streak"),
            F.min(F.col("streak_start").cast("string")).alias("first_streak_start"),
        )
        .filter(F.col("longest_streak") >= 3)
    )


_EWMA_DECAY = 0.8   # weight ratio between consecutive observations
_EWMA_SPAN = 20     # trailing frame length


@register(
    "window_ewma",
    oracle=f"""
WITH w AS (
  SELECT event_id, event_type, value,
         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM events)
SELECT event_id, event_type, value,
       round(list_aggregate(list_transform(range(1, len(vals)+1),
                 i -> vals[i] * pow({_EWMA_DECAY}, len(vals)-i)), 'sum')
             / list_aggregate(list_transform(range(1, len(vals)+1),
                 i -> pow({_EWMA_DECAY}, len(vals)-i)), 'sum'), 6) AS ewma
FROM w
""",
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over a trailing {_EWMA_SPAN}-row
    frame per event_type — the smoothing every monitoring/trading stack
    leans on, and a shape Spark has NO built-in for (there is no ewm()
    window aggregate). Composed instead of UDF'd: collect the frame with a
    windowed collect_list (frame order = ORDER BY order, ties broken on
    event_id), then an indexed transform+aggregate fold computes
    sum(x_j * d^(n-1-j)) / sum(d^(n-1-j)) entirely JVM-side.

    Bounding the frame is what makes this scale-honest: the textbook
    recursive EWMA (ewma_k = a*x_k + (1-a)*ewma_{{k-1}}) is an unbounded
    sequential dependency — on a cluster that means single-task-per-key
    state; the {_EWMA_SPAN}-row window truncates weights below d^{_EWMA_SPAN}
    (~1%% mass) and stays an embarrassingly parallel window pass. Both
    engines fold the identical weight list sequentially, so the doubles
    agree bitwise before rounding."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), W.currentRow)
    )
    vals = F.collect_list("value").over(w)
    n = F.size(F.col("vals"))
    d = F.lit(_EWMA_DECAY)
    num = F.aggregate(
        F.transform(F.col("vals"), lambda x, i: x * F.pow(d, (n - 1 - i).cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(F.col("vals"), lambda x, i: F.pow(d, (n - 1 - i).cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.select("event_id", "event_type", "value", vals.alias("vals"))
        .select(
            "event_id", "event_type", "value",
            dround(num / den, 6).alias("ewma"),
        )
    )


_CORR_FRAME = 24   # trailing window length (hours)


@register(
    "window_rolling_corr",
    oracle=f"""
WITH b AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
         sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS x,
         sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END) AS y
  FROM events GROUP BY 1),
w AS (
  SELECT bucket, x, y,
         count(*) OVER fr AS n,
         sum(x) OVER fr AS sx, sum(y) OVER fr AS sy,
         sum(x*x) OVER fr AS sxx, sum(y*y) OVER fr AS syy,
         sum(x*y) OVER fr AS sxy
  FROM b WINDOW fr AS (ORDER BY bucket
                       ROWS BETWEEN {_CORR_FRAME - 1} PRECEDING AND CURRENT ROW))
SELECT bucket,
       round((n*sxy - sx*sy)
             / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS rolling_corr
FROM w WHERE n = {_CORR_FRAME}
""",
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between two event streams (hourly
    purchase value vs click value over a trailing {_CORR_FRAME}-hour
    window) — the co-movement monitor behind pair trading, metric
    cross-correlation, and cannibalization dashboards. Computed from raw
    moment sums over the frame (n·Σxy − ΣxΣy over the √ of the variance
    products) rather than a corr() window aggregate, because the two
    engines' streaming-corr implementations accumulate in different
    orders — the explicit-moments form gives both the same frame-ordered
    sums.

    Scale shape: ALL the data reduction happens in the distributed
    conditional-sum groupBy (one hash exchange over the events); the
    rolling window then runs over the pre-aggregated hourly series, whose
    cardinality is O(hours) — a few thousand rows per YEAR even at 100 TB
    of events — so the unpartitioned window is a deliberately tiny tail
    stage, not the single-task trap it would be over raw events."""
    e = table(spark, sf_dir, "events")
    b = e.groupBy(F.window("ts", "1 hour").start.alias("bucket")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)).alias("y"),
    )
    fr = W.orderBy("bucket").rowsBetween(-(_CORR_FRAME - 1), W.currentRow)
    n = F.count(F.lit(1)).over(fr)
    sx, sy = F.sum("x").over(fr), F.sum("y").over(fr)
    sxx = F.sum(F.col("x") * F.col("x")).over(fr)
    syy = F.sum(F.col("y") * F.col("y")).over(fr)
    sxy = F.sum(F.col("x") * F.col("y")).over(fr)
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        b.select("bucket", corr.alias("c"), n.alias("n"))
        .filter(F.col("n") == _CORR_FRAME)
        .select("bucket", dround("c", 6).alias("rolling_corr"))
    )


@register(
    "window_pareto_abc",
    oracle="""
WITH rev AS (
  SELECT c.c_mktsegment, o.o_custkey, round(sum(o.o_totalprice), 2) AS revenue
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, o.o_custkey),
ranked AS (
  SELECT c_mktsegment, o_custkey, revenue,
         sum(revenue) OVER (PARTITION BY c_mktsegment
                            ORDER BY revenue DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
         sum(revenue) OVER (PARTITION BY c_mktsegment) AS seg_rev
  FROM rev)
SELECT c_mktsegment, o_custkey, revenue,
       round(cum_rev / seg_rev, 6) AS cum_share,
       CASE WHEN round(cum_rev / seg_rev, 6) <= 0.5 THEN 'A'
            WHEN round(cum_rev / seg_rev, 6) <= 0.8 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
""",
)
def window_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis: customers ranked by revenue within their
    market segment, with cumulative revenue share and the classic A/B/C
    classification (top customers covering 50% of segment revenue are 'A',
    the next 30% 'B', the tail 'C') — the inventory/account-management
    workhorse built on a running-total window.

    Scale shape: the revenue rollup is one partial-aggregable groupBy; the
    running share and the segment total are BOTH windows over the same
    c_mktsegment partitioning, so Catalyst plans them on ONE exchange (two
    sorts at most). Per-customer revenue is rounded to cents BEFORE the
    cumulative sum, and the running frame accumulates in ORDER BY order in
    both engines, so the share — and therefore the knife-edge class
    boundaries — compare on identical doubles."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(gated_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(dround(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w_run = (
        W.partitionBy("c_mktsegment")
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("c_mktsegment")
    share = dround(F.sum("revenue").over(w_run) / F.sum("revenue").over(w_all), 6)
    return rev.select(
        "c_mktsegment",
        "o_custkey",
        "revenue",
        share.alias("cum_share"),
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias("abc_class"),
    )


_HOLT_ALPHA = 0.5   # level smoothing
_HOLT_BETA = 0.3    # trend smoothing
_HOLT_SPAN = 20     # trailing frame length (same bounding rationale as EWMA)
# The trend update is pre-expanded to literal coefficients so BOTH engines
# run the identical FP op sequence:
#   nt = b*(nl - l) + (1-b)*t  ==  (a*b)*(x - l) + (b*(1-a) + (1-b))*t
_HOLT_C1 = 0.15     # a*b
_HOLT_C2 = 0.85     # b*(1-a) + (1-b)


def _holt_coefficient_tables():
    """Closed-form Holt weights (VERDICT r5 #6). The recursion is LINEAR in
    the frame values: with state s = [level, trend],

        s_k = A s_{k-1} + b x_k,  A = [[1-a, 1-a], [-c1, c2]],  b = [a, c1]

    so over a frame x_1..x_n the state is a fixed weighted sum —
    x_1 contributes A^(n-1)·e1 (it seeds s_1 = [x_1, 0]) and x_j (j≥2)
    contributes A^(n-j)·b. Precomputing those powers once on the driver
    turns the per-row 20-step interpreted struct fold into two dot products
    against literal coefficient arrays (the window_ewma trick). Returns
    (inj, init): inj[lag] = A^lag·b for the injected terms, init[m] =
    A^m·e1 for the frame-seed term, each a (level_w, trend_w) pair."""
    one_a = 1.0 - _HOLT_ALPHA
    inj, init = [], []
    v_inj, v_init = (_HOLT_ALPHA, _HOLT_C1), (1.0, 0.0)
    for _ in range(_HOLT_SPAN):
        inj.append(v_inj)
        init.append(v_init)
        v_inj = (one_a * (v_inj[0] + v_inj[1]), -_HOLT_C1 * v_inj[0] + _HOLT_C2 * v_inj[1])
        v_init = (one_a * (v_init[0] + v_init[1]), -_HOLT_C1 * v_init[0] + _HOLT_C2 * v_init[1])
    return inj, init


_HOLT_INJ, _HOLT_INIT = _holt_coefficient_tables()


def _holt_sql_list(weights):
    """Render a coefficient list as an exact-double DuckDB literal (repr is
    round-trip exact; the CAST defeats DuckDB's DECIMAL literal inference)."""
    return "[" + ", ".join(f"CAST({w!r} AS DOUBLE)" for w in weights) + "]"


@register(
    "window_holt_trend",
    # Closed-form weights shared by both engines as identical literal
    # arrays (exact-double repr), multiplied and left-summed in the same
    # order → bitwise-identical doubles before rounding. The leading
    # `0.0 +` canonicalizes a possible all-(-0.0)-terms sum to +0.0 (the
    # Spark fold's 0.0 seed already does).
    oracle=f"""
WITH w AS (
  SELECT event_id, event_type, value,
         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN {_HOLT_SPAN - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM events),
f AS (
  SELECT event_id, event_type, value,
         0.0 + list_aggregate(list_transform(range(1, len(vals)+1),
           i -> vals[i] * (CASE WHEN i = 1
                           THEN {_holt_sql_list(w[0] for w in _HOLT_INIT)}[len(vals)]
                           ELSE {_holt_sql_list(w[0] for w in _HOLT_INJ)}[len(vals) - i + 1]
                           END)), 'sum') AS level,
         0.0 + list_aggregate(list_transform(range(1, len(vals)+1),
           i -> vals[i] * (CASE WHEN i = 1
                           THEN {_holt_sql_list(w[1] for w in _HOLT_INIT)}[len(vals)]
                           ELSE {_holt_sql_list(w[1] for w in _HOLT_INJ)}[len(vals) - i + 1]
                           END)), 'sum') AS trend
  FROM w)
SELECT event_id, event_type, value,
       round(level, 6)         AS level,
       round(trend, 6)         AS trend,
       round(level + trend, 6) AS forecast_1
FROM f
""",
)
def window_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend) over a trailing
    20-row frame per event_type — the trend-aware upgrade of window_ewma,
    with a one-step-ahead forecast (level + trend), the monitoring/
    capacity-planning primitive plain EWMA cannot give (it lags any
    trending series). No Spark built-in exists; composed as a windowed
    collect_list + TWO dot products against precomputed literal weight
    arrays (_holt_coefficient_tables — the recursion is linear in the
    frame, so its unrolled form is a fixed weighted sum), entirely
    JVM-side with ~1 mul+add per element instead of the round-5 20-step
    interpreted struct fold (VERDICT r5 #6).

    Scale: same argument as window_ewma — the textbook unbounded recursion
    is a single-task-per-key sequential dependency, while the bounded frame
    is an embarrassingly parallel window pass whose truncation error decays
    geometrically. Both engines multiply the identical literal weights and
    left-sum in the same order, so the doubles agree bitwise before
    rounding."""
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_HOLT_SPAN - 1), W.currentRow)
    )
    vals = F.collect_list("value").over(w).alias("vals")
    n = F.size("vals")

    def dot(component: int) -> Column:
        init = F.array(*[F.lit(c[component]) for c in _HOLT_INIT])
        inj = F.array(*[F.lit(c[component]) for c in _HOLT_INJ])
        terms = F.transform(
            F.col("vals"),
            lambda x, i: x
            * F.when(i == 0, F.element_at(init, n)).otherwise(
                F.element_at(inj, n - i)
            ),
        )
        return F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)

    level, trend = dot(0), dot(1)
    return (
        e.select("event_id", "event_type", "value", vals)
        .select(
            "event_id",
            "event_type",
            "value",
            dround(level, 6).alias("level"),
            dround(trend, 6).alias("trend"),
            dround(level + trend, 6).alias("forecast_1"),
        )
    )


_CUSUM_SPAN = 20    # trailing frame (same bounding rationale as EWMA/Holt)
_CUSUM_SLACK = 0.5  # k: deviations under k·σ-ish slack don't accumulate
_CUSUM_H = 5.0      # alarm threshold on the accumulated drift


@register(
    "window_cusum_drift",
    # list-state fold (NOT struct state — see window_holt_trend's DuckDB
    # struct-lambda mutation note); literal coefficients shared by both
    # engines so the FP op sequences are identical.
    oracle=f"""
WITH m AS (
  SELECT event_type,
         round(avg(value), 6) AS mu
  FROM events GROUP BY event_type),
w AS (
  SELECT e.event_id, e.event_type, e.value, m.mu,
         list(round(e.value, 6)) OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                           ROWS BETWEEN {_CUSUM_SPAN - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM events e JOIN m USING (event_type)),
f AS (
  SELECT event_id, event_type, value, mu,
         list_reduce(
           list_transform(vals, v -> [
             greatest(CAST(0.0 AS DOUBLE), v - mu - CAST({_CUSUM_SLACK} AS DOUBLE)),
             greatest(CAST(0.0 AS DOUBLE), mu - v - CAST({_CUSUM_SLACK} AS DOUBLE))]),
           (acc, x) -> [
             greatest(CAST(0.0 AS DOUBLE), acc[1] + x[1]),
             greatest(CAST(0.0 AS DOUBLE), acc[2] + x[2])]) AS st
  FROM w)
SELECT event_id, event_type,
       round(st[1], 6) AS cusum_up,
       round(st[2], 6) AS cusum_down,
       (st[1] > {_CUSUM_H} OR st[2] > {_CUSUM_H}) AS drift_alarm
FROM f
""",
)
def window_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detection per event_type — the changepoint
    alarm a data-quality monitor runs over every pipeline metric (corpus
    drift, score distribution shift): accumulate deviations beyond a slack
    band around the per-key mean, clamped at zero, alarm when either side's
    accumulation crosses the threshold. Page's classic sequential test,
    over a bounded trailing frame (the unbounded textbook recursion is a
    single-task-per-key sequential dependency; the {span}-row frame keeps
    it an embarrassingly parallel window pass and still catches any drift
    that persists longer than the frame).

    The zero-clamp makes the fold non-linear, so unlike EWMA it cannot
    collapse to a weighted sum: the sequential list fold is the honest
    expression, and both engines replay it bitwise (inputs pre-rounded so
    the per-element deviations start from identical doubles).""".format(
        span=_CUSUM_SPAN
    )
    e = table(spark, sf_dir, "events")
    mu_tbl = e.groupBy("event_type").agg(dround(F.avg("value"), 6).alias("mu"))
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_CUSUM_SPAN - 1), W.currentRow)
    )
    slack = F.lit(float(_CUSUM_SLACK))
    zero = F.lit(0.0)
    joined = e.join(F.broadcast(mu_tbl), "event_type").select(
        "event_id",
        "event_type",
        "mu",
        F.collect_list(dround("value", 6)).over(w).alias("vals"),
    )
    devs = F.transform(
        F.col("vals"),
        lambda v: F.array(
            F.greatest(zero, v - F.col("mu") - slack),
            F.greatest(zero, F.col("mu") - v - slack),
        ),
    )
    st = F.aggregate(
        F.slice(devs, 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(devs, 1),
        lambda acc, x: F.array(
            F.greatest(zero, F.element_at(acc, 1) + F.element_at(x, 1)),
            F.greatest(zero, F.element_at(acc, 2) + F.element_at(x, 2)),
        ),
    )
    return joined.select(
        "event_id",
        "event_type",
        dround(F.element_at(st, 1), 6).alias("cusum_up"),
        dround(F.element_at(st, 2), 6).alias("cusum_down"),
        (
            (F.element_at(st, 1) > F.lit(_CUSUM_H))
            | (F.element_at(st, 2) > F.lit(_CUSUM_H))
        ).alias("drift_alarm"),
    )


@register(
    "window_seasonal_decompose",
    oracle="""
WITH e AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT)         AS vi,
           CAST(floor(epoch(ts)) AS BIGINT) // 86400        AS d,
           (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24  AS hour
    FROM events
),
det AS (
    SELECT event_type, hour,
           vi - CAST(floor(
                 CAST(sum(vi) OVER (PARTITION BY event_type, d) AS DOUBLE)
                 / count(*) OVER (PARTITION BY event_type, d)) AS BIGINT) AS det
    FROM e
),
seas AS (
    SELECT event_type, hour, det,
           CAST(floor(
             CAST(sum(det) OVER (PARTITION BY event_type, hour) AS DOUBLE)
             / count(*) OVER (PARTITION BY event_type, hour)) AS BIGINT) AS sc
    FROM det
)
SELECT event_type,
       CAST(hour AS BIGINT)                                    AS hour,
       CAST(count(*) AS BIGINT)                                AS n,
       round(CAST(sum(det) AS DOUBLE) / count(*) / 100.0, 6)   AS seasonal,
       round(CAST(sum(abs(det - sc)) AS DOUBLE) / count(*) / 100.0, 6)
                                                               AS resid_mad
FROM seas
GROUP BY event_type, hour
ORDER BY event_type, hour
""",
)
def window_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive SEASONAL DECOMPOSITION of an event stream — the classic
    trend/seasonal/residual split (STL's moving-average skeleton) that
    metric pipelines run before anomaly thresholds: per event type, the
    DAILY mean is the trend, the mean of the detrended values per
    HOUR-OF-DAY is the seasonal profile, and what remains is residual —
    reported as per-(type, hour) seasonal level + mean absolute residual,
    the pair a monitoring system alarms on (big |seasonal| = strong
    diurnal shape; big residual MAD = noisy hour).

    Cross-engine FP discipline: averaging rounded doubles lands EXACTLY
    on round-half boundaries (avg of 1e-6 multiples over n hits x.5e-6
    whenever sum ≡ n/2 mod n), where engine sum-reorder flips the 6th
    decimal — so the whole decomposition runs in INTEGER CENTS
    (floor(value*100+0.5), then floor-divided window means), exact and
    identical on both engines; doubles appear only in the final
    division, an exact-integer-over-integer quotient both engines
    compute bit-identically.

    Scale (100 TB): two whole-partition window sums — one keyed
    (type, day), one (type, hour) — then one partial-agg groupBy; no
    self-joins, no collect, each window one hash exchange."""
    e = table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vi"),
        F.expr("cast(ts as long) div 86400").alias("d"),
        (F.expr("cast(ts as long) div 3600") % 24).alias("hour"),
    )
    w_day = W.partitionBy("event_type", "d")
    det = base.select(
        "event_type", "hour",
        (
            F.col("vi")
            - F.floor(
                F.sum("vi").over(w_day).cast("double")
                / F.count(F.lit(1)).over(w_day)
            ).cast("long")
        ).alias("det"),
    )
    w_hr = W.partitionBy("event_type", "hour")
    seas = det.withColumn(
        "sc",
        F.floor(
            F.sum("det").over(w_hr).cast("double") / F.count(F.lit(1)).over(w_hr)
        ).cast("long"),
    )
    return (
        seas.groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dround(
                F.sum("det").cast("double") / F.count(F.lit(1)) / 100.0, 6
            ).alias("seasonal"),
            dround(
                F.sum(F.abs(F.col("det") - F.col("sc"))).cast("double")
                / F.count(F.lit(1))
                / 100.0,
                6,
            ).alias("resid_mad"),
        )
        .select(
            "event_type", F.col("hour").cast("bigint").alias("hour"),
            "n", "seasonal", "resid_mad",
        )
        .orderBy("event_type", "hour")
    )

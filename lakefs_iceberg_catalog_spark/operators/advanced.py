"""Ring A extensions: quantiles, skew-proof two-phase aggregation,
range-frame windows, unpivot.

Scale notes (100 TB):
- agg_quantile: exact interpolated percentiles are sort-based; the approx
  variant (percentile_approx, a mergeable sketch) is the cluster-scale path
  and its accuracy is asserted in tests.
- agg_salted_twophase: THE pattern for skewed keys — salt the key, partially
  aggregate (salt, key), then finish per key. The first shuffle spreads a
  hot key over N partitions instead of melting one reducer.
- window_range_frame: RANGE frames bound state by *value* distance (trailing
  10 minutes), the window-function dual of a sliding stream window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .util import dround, gated_broadcast

_SALT_BUCKETS = 16


@register(
    "agg_quantile",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4)  AS p50_qty,
       round(quantile_cont(l_quantity, 0.9), 4)  AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont). At 100 TB switch to percentile_approx — same call shape,
    mergeable sketch instead of a per-group sort."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        dround(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        dround(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99_price"),
    )


@register(
    "agg_quantile_approx",
    # Sketch values are engine-specific, so the driver-checked contract is
    # the RANK-ERROR CLAIM of the sketch (Greenwald-Khanna / KLL): the
    # returned value v must be an exact φ-quantile for some φ within
    # p ± ε — i.e. the rank interval [#rows<v, #rows≤v]/n must intersect
    # [p−ε, p+ε]. The oracle states that a correct sketch yields TRUE per
    # group. Tie-safe (l_quantity is heavily tied) because the check uses
    # the full rank interval of v, not a single rank.
    oracle="""
SELECT l_returnflag, TRUE AS p50_ok, TRUE AS p99_ok
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (KLL-style mergeable sketch): constant memory per
    group per partition — the 100 TB replacement for agg_quantile. The
    verification pass (one broadcast join of the 3-row sketch output back
    onto the fact, one re-aggregate) asserts the sketch's rank-error bound
    and is output as the driver-compared result."""
    eps = 0.005  # accuracy=10000 → rank error 1e-4; 50× slack stays strict
    li = table(spark, sf_dir, "lineitem")
    appx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("p50q"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("p99p"),
    )
    joined = li.join(F.broadcast(appx), "l_returnflag")
    chk = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_quantity") < F.col("p50q")).cast("long")).alias("lt50"),
        F.sum((F.col("l_quantity") <= F.col("p50q")).cast("long")).alias("le50"),
        F.sum((F.col("l_extendedprice") < F.col("p99p")).cast("long")).alias("lt99"),
        F.sum((F.col("l_extendedprice") <= F.col("p99p")).cast("long")).alias("le99"),
    )
    return chk.select(
        "l_returnflag",
        (
            (F.col("lt50") / F.col("n") <= 0.5 + eps)
            & (F.col("le50") / F.col("n") >= 0.5 - eps)
        ).alias("p50_ok"),
        (
            (F.col("lt99") / F.col("n") <= 0.99 + eps)
            & (F.col("le99") / F.col("n") >= 0.99 - eps)
        ).alias("p99_ok"),
    )


@register(
    "agg_salted_twophase",
    oracle="""
SELECT event_type,
       count(*)             AS n,
       round(sum(value), 2) AS total,
       max(value)           AS max_value
FROM events
GROUP BY event_type
""",
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation on a hot low-cardinality key (event_type — 5
    values over all rows): phase 1 aggregates (key, salt) so each hot key
    spreads over 16 reducers; phase 2 merges the 16 partials per key.
    Identical result to the direct groupBy (the oracle), by construction:
    count=Σcounts, sum=Σ(partial sums, ordered by salt for a deterministic
    double-add order), max=max(partial maxes)."""
    e = table(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % _SALT_BUCKETS).cast("int")
    )
    phase1 = e.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("value").alias("s1"),
        F.max("value").alias("m1"),
    )
    # deterministic merge order for the float sum: sort partials by salt
    # inside each key via a sorted struct collect, then fold
    phase2 = phase1.groupBy("event_type").agg(
        F.sum("n1").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("salt", "s1"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s1"],
        ).alias("total_raw"),
        F.max("m1").alias("max_value"),
    )
    return phase2.select("event_type", "n", dround("total_raw", 2).alias("total"), "max_value")


@register(
    "window_range_frame",
    oracle="""
SELECT event_id, user_id, ts,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS n_last_10m,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 2) AS v_last_10m
FROM events
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time MICROSECONDS (integer — exact boundary
    membership in both engines): per user, how many events / how much value
    in the trailing 10 minutes — the batch dual of a sliding stream window,
    state bounded by the range not the row count."""
    e = table(spark, sf_dir, "events")
    return e.selectExpr(
        "event_id",
        "user_id",
        "ts",
        """count(*) OVER (PARTITION BY user_id ORDER BY unix_micros(ts)
                          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS n_last_10m""",
        """sum(value) OVER (PARTITION BY user_id ORDER BY unix_micros(ts)
                            RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS v_raw""",
    ).select(
        "event_id", "user_id", "ts", "n_last_10m", dround("v_raw", 2).alias("v_last_10m")
    )


@register(
    "unpivot_stack",
    oracle="""
SELECT l_returnflag, metric, round(val, 2) AS val
FROM (
    SELECT l_returnflag,
           sum(l_quantity)      AS qty,
           sum(l_extendedprice) AS price,
           sum(l_discount)      AS disc
    FROM lineitem GROUP BY l_returnflag
)
UNPIVOT (val FOR metric IN (qty, price, disc))
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of an aggregate (melt): one row per (group, metric).
    Spark's unpivot is a zero-shuffle Expand — rows multiply locally."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.sum("l_extendedprice").alias("price"),
        F.sum("l_discount").alias("disc"),
    )
    return (
        wide.unpivot("l_returnflag", ["qty", "price", "disc"], "metric", "val_raw")
        .select("l_returnflag", "metric", dround("val_raw", 2).alias("val"))
    )


_FUNNEL_WINDOW_H = 24


@register(
    "agg_funnel_steps",
    oracle=f"""
WITH s1 AS (SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS click_ts
       FROM events e JOIN s1 ON s1.user_id = e.user_id
        AND e.ts > s1.signup_ts
        AND e.ts <= s1.signup_ts + INTERVAL {_FUNNEL_WINDOW_H} HOUR
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts
       FROM events e JOIN s2 ON s2.user_id = e.user_id
        AND e.ts > s2.click_ts
        AND e.ts <= s2.click_ts + INTERVAL {_FUNNEL_WINDOW_H} HOUR
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT s1.user_id, s1.signup_ts, s2.click_ts, s3.purchase_ts,
       1 + (CASE WHEN s2.click_ts IS NULL THEN 0 ELSE 1 END)
         + (CASE WHEN s3.purchase_ts IS NULL THEN 0 ELSE 1 END) AS depth,
       round(CASE WHEN s3.purchase_ts IS NULL THEN NULL
             ELSE (epoch_us(s3.purchase_ts) - epoch_us(s1.signup_ts)) / 3600000000.0
             END, 6) AS hours_to_convert
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
""",
)
def agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered multi-step funnel (signup → click → purchase, each step
    within {_FUNNEL_WINDOW_H} h of the previous) — the MATCH_RECOGNIZE /
    windowFunnel analytics shape, built from per-step conditional
    aggregations.

    Scale shape: step 1 is one user_id rollup of the signup slice; each
    later step joins the PREVIOUS step's user-cardinality table (≪ events —
    broadcastable in practice) onto the event slice for its type, pushed
    filters keeping the probe side to one event type. Per-step cost is one
    filtered scan + one hash join + one partial-agg rollup — never a
    per-user subquery, never a whole-history sort. Depth and
    time-to-convert come out per user for cohort rollups downstream."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    win = F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(gated_broadcast(s1), "user_id")
        .filter((F.col("ts") > F.col("signup_ts")) & (F.col("ts") <= F.col("signup_ts") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(gated_broadcast(s2), "user_id")
        .filter((F.col("ts") > F.col("click_ts")) & (F.col("ts") <= F.col("click_ts") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "click_ts",
            "purchase_ts",
            (
                F.lit(1)
                + F.when(F.col("click_ts").isNull(), 0).otherwise(1)
                + F.when(F.col("purchase_ts").isNull(), 0).otherwise(1)
            ).alias("depth"),
            dround(
                (
                    F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")
                ).cast("double")
                / 3600000000.0,
                6,
            ).alias("hours_to_convert"),
        )
    )


@register(
    "rollup_gapfill_locf",
    oracle="""
WITH bounds AS (
  SELECT time_bucket(INTERVAL '6 hours', min(ts)) AS lo,
         time_bucket(INTERVAL '6 hours', max(ts)) AS hi
  FROM events WHERE event_type = 'purchase'
),
grid AS (SELECT u.user_id, unnest(generate_series(b.lo, b.hi, INTERVAL 6 HOUR)) AS bucket
         FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') u, bounds b),
actual AS (SELECT user_id, time_bucket(INTERVAL '6 hours', ts) AS bucket,
                  round(sum(value), 2) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT g.user_id, g.bucket, a.v AS observed,
       last_value(a.v IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS filled
FROM grid g LEFT JOIN actual a ON a.user_id = g.user_id AND a.bucket = g.bucket
""",
)
def rollup_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with last-observation-carried-forward — the
    TimescaleDB `time_bucket_gapfill` + `locf` shape: a dense (user ×
    6-hour bucket) grid is generated, per-bucket purchase sums land on it,
    and missing cells inherit the user's previous observation via an
    IGNORE NULLS running last (cells before a user's first observation stay
    NULL, the locf contract).

    Scale shape: the grid is users × generate_series — built by exploding a
    per-user literal sequence, no shuffle; the observation join shuffles
    only actual observations (sparse ≪ grid); the fill is ONE window pass
    per user partition. At 100 TB the grid never materializes outside its
    partition and the bucket bounds come from one min/max aggregate."""
    from pyspark.sql.window import Window as W

    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    lo, hi = e.agg(
        F.min(F.window("ts", "6 hours").start),
        F.max(F.window("ts", "6 hours").start),
    ).collect()[0]
    grid = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(lo).cast("timestamp"),
                    F.lit(hi).cast("timestamp"),
                    F.expr("INTERVAL 6 HOURS"),
                )
            ).alias("bucket"),
        )
    )
    actual = (
        e.groupBy("user_id", F.window("ts", "6 hours").start.alias("bucket"))
        .agg(dround(F.sum("value"), 2).alias("v"))
    )
    w = W.partitionBy("user_id").orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return (
        grid.join(actual, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.col("v").alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("filled"),
        )
    )


@register(
    "window_retention_cohorts",
    oracle="""
WITH first_seen AS (
    SELECT user_id, time_bucket(INTERVAL '7 days', min(ts)) AS cohort
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
cohort_size AS (SELECT cohort, count(*) AS n_users FROM first_seen GROUP BY cohort),
act AS (SELECT DISTINCT user_id, time_bucket(INTERVAL '7 days', ts) AS wk
        FROM events WHERE event_type = 'purchase'),
ret AS (
    SELECT f.cohort, CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
           count(*) AS n_active
    FROM first_seen f JOIN act a ON a.user_id = f.user_id AND a.wk >= f.cohort
    GROUP BY 1, 2
)
SELECT r.cohort, r.week_offset, r.n_active,
       round(CAST(r.n_active AS DOUBLE) / c.n_users, 6) AS retention
FROM ret r JOIN cohort_size c ON c.cohort = r.cohort
ORDER BY r.cohort, r.week_offset
""",
)
def window_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics rollup:
    users grouped by their first-signup week, retention = the fraction of
    each cohort with purchase activity k weeks later.

    Week buckets must agree across engines: DuckDB's time_bucket anchors
    7-day buckets on Monday (origin 2000-01-03), Spark's window() on the
    epoch (a Thursday) — the 4-day startTime offset re-anchors Spark to
    Monday so both engines bucket identically. Scale shape: first-seen and
    activity are per-user partial-agg rollups; the retention join is
    cohort-week-cardinality (tiny) against a per-user table; nothing is
    ever per-event after the first aggregations."""
    from pyspark.sql.window import Window as W  # noqa: F401  (module pattern)

    e = table(spark, sf_dir, "events")
    wk7 = lambda c: F.window(c, "7 days", "7 days", "4 days").start  # noqa: E731
    first_seen = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", wk7("first_ts").alias("cohort"))
    )
    cohort_size = first_seen.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    act = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", wk7("ts").alias("wk"))
        .distinct()
    )
    ret = (
        first_seen.join(act, "user_id")
        .filter(F.col("wk") >= F.col("cohort"))
        .groupBy(
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        ret.join(F.broadcast(cohort_size), "cohort")
        .select(
            "cohort",
            "week_offset",
            "n_active",
            dround(F.col("n_active").cast("double") / F.col("n_users"), 6).alias("retention"),
        )
        .orderBy("cohort", "week_offset")
    )


@register(
    "window_anomaly_zscore",
    oracle="""
WITH w AS (
  SELECT user_id, event_id, ts, round(value, 2) AS v,
         round(avg(value) OVER f, 6)         AS mu,
         round(stddev_samp(value) OVER f, 6) AS sd,
         count(*) OVER f                     AS n_hist
  FROM events WHERE event_type = 'purchase'
  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, ts, v, mu, sd,
       round(CASE WHEN n_hist >= 5 AND sd > 0 THEN (v - mu) / sd END, 6) AS z,
       (n_hist >= 5 AND sd > 0 AND abs((v - mu) / sd) > 3) AS is_anomaly
FROM w
""",
)
def window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection — the streaming-metrics shape: each
    purchase scored against ITS OWN trailing window (last ≤20 purchases by
    the same user, current row excluded), flagged when it sits more than 3
    trailing standard deviations out; rows with under 5 history points
    abstain (cold start).

    Determinism note: the trailing mean/std are rounded to 6 places BEFORE
    the z computation on BOTH engines — Spark folds the frame sequentially
    while DuckDB uses segment-tree accumulation, so the raw doubles differ
    in the last ulps and a knife-edge |z|>3 could otherwise flip. Scale
    shape: one shuffle on user_id, per-user frame scan — the batch twin of
    what applyInPandasWithState runs incrementally on the live stream."""
    from pyspark.sql.window import Window as W

    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    f = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    w = e.select(
        "user_id",
        "event_id",
        "ts",
        dround("value", 2).alias("v"),
        dround(F.avg("value").over(f), 6).alias("mu"),
        dround(F.stddev_samp("value").over(f), 6).alias("sd"),
        F.count(F.lit(1)).over(f).alias("n_hist"),
    )
    ok = (F.col("n_hist") >= 5) & (F.col("sd") > 0)
    z = (F.col("v") - F.col("mu")) / F.col("sd")
    return w.select(
        "user_id",
        "event_id",
        "ts",
        "v",
        "mu",
        "sd",
        dround(F.when(ok, z), 6).alias("z"),
        (ok & (F.abs(z) > 3)).alias("is_anomaly"),
    )


@register(
    "window_anomaly_mad",
    oracle="""
WITH med AS (
  SELECT user_id,
         round(quantile_cont(value, 0.5), 6) AS med,
         CAST(count(*) AS BIGINT)            AS n_obs
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
mad AS (
  SELECT e.user_id,
         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN med m ON e.user_id = m.user_id
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT e.user_id, e.event_id, round(e.value, 2) AS v, m.med, d.mad, m.n_obs,
       round(CASE WHEN m.n_obs >= 5 AND d.mad > 0
                  THEN (e.value - m.med) / (1.4826 * d.mad) END, 6)
         AS robust_z,
       (m.n_obs >= 5 AND d.mad > 0
        AND abs((e.value - m.med) / (1.4826 * d.mad)) > 3) AS is_anomaly
FROM events e
JOIN med m ON e.user_id = m.user_id
JOIN mad d ON e.user_id = d.user_id
WHERE e.event_type = 'purchase'
""",
)
def window_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN/MAD robust outlier scoring — the heavy-tail-safe twin of
    window_anomaly_zscore: each user's purchases score against the
    user's MEDIAN and Median-Absolute-Deviation (consistency constant
    1.4826 makes the robust z comparable to a σ z-score on normal
    data); mean/σ themselves get dragged by the very outliers being
    hunted, which is why monitoring pipelines prefer MAD. Users with
    under 5 observations or zero MAD abstain.

    Determinism: the median and MAD round to 6 places before the score
    on both engines (Spark `percentile` ≡ DuckDB quantile_cont,
    interpolated). Scale: two grouped exact percentiles (per-group
    sort; swap to percentile_approx's mergeable sketch at 100 TB — same
    call shape) + one broadcastable per-user stats join; events shuffle
    once on user_id."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    med = e.groupBy("user_id").agg(
        dround(F.percentile("value", F.lit(0.5)), 6).alias("med"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )
    from .util import gated_broadcast

    mad = (
        e.join(gated_broadcast(med), "user_id")
        .groupBy("user_id")
        .agg(
            dround(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)),
                6,
            ).alias("mad")
        )
    )
    ok = (F.col("n_obs") >= 5) & (F.col("mad") > 0)
    rz = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        e.join(gated_broadcast(med), "user_id")
        .join(gated_broadcast(mad), "user_id")
        .select(
            "user_id",
            "event_id",
            dround("value", 2).alias("v"),
            "med",
            "mad",
            "n_obs",
            dround(F.when(ok, rz), 6).alias("robust_z"),
            (ok & (F.abs(rz) > 3)).alias("is_anomaly"),
        )
    )


@register(
    "window_first_touch_attribution",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
m AS (SELECT p.event_id, min(c.ts) AS first_click_ts
      FROM p JOIN c ON c.user_id = p.user_id
                   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 7 DAY
      GROUP BY p.event_id)
SELECT p.event_id, p.user_id, p.ts,
       m.first_click_ts,
       m.first_click_ts IS NOT NULL AS attributed
FROM p LEFT JOIN m ON m.event_id = p.event_id
""",
)
def window_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credited to the EARLIEST click
    in its trailing 7-day window (vs join_asof's latest-before = last
    touch). Implemented as an event-time RANGE frame over the per-user
    merged stream — `min(click ts) OVER (ORDER BY ts RANGE INTERVAL 7 DAYS
    PRECEDING)` — so the cost is ONE shuffle on user_id and one ordered
    pass, with no click×purchase fanout at all; the oracle is the
    equivalent (fanout-paying) range join. At 100 TB the window form wins
    precisely because heavy users multiply the join's per-user fanout but
    not the frame scan."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    ).select("event_id", "user_id", "event_type", "ts")
    tagged = e.withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    )
    first_click = F.expr(
        "min(click_ts) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)"
    )
    return (
        tagged.withColumn("first_click_ts", first_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "first_click_ts",
            F.col("first_click_ts").isNotNull().alias("attributed"),
        )
    )


@register(
    "agg_mode_deterministic",
    oracle="""
WITH c AS (
    SELECT l_returnflag, CAST(l_quantity AS INT) AS qty, count(*) AS n
    FROM lineitem GROUP BY 1, 2
),
r AS (
    SELECT l_returnflag, qty, n,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY n DESC, qty) AS rk
    FROM c
)
SELECT l_returnflag, qty AS mode_quantity, n AS mode_count
FROM r WHERE rk = 1
""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent order quantity per
    return flag, ties broken by the smaller value — built as count-rollup + rank
    rather than the engine's mode() (whose tie behavior is unspecified and
    engine-dependent, so it could never hash-match). Two partial-agg
    shuffles on low-cardinality keys; the rank window runs over
    group-cardinality rows, not input rows."""
    from pyspark.sql.window import Window as W

    c = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", F.col("l_quantity").cast("int").alias("qty"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "qty")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_quantity"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "window_user_gap_stats",
    oracle="""
WITH g AS (
    SELECT user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) AS gap_us
    FROM events
)
SELECT user_id,
       count(*) + 1                                        AS n_events,
       round(avg(gap_us) / 1000000.0, 6)                   AS avg_gap_s,
       max(gap_us) // 1000000                              AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
)
def window_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user — the engagement-cadence rollup
    (and the input to choosing a sessionization timeout): lag() over the
    per-user time order yields each gap, one rollup summarizes it. One
    shuffle on user_id shared by the window and the aggregate; integer
    microsecond gaps keep the arithmetic engine-exact, only the final
    average is float (rounded)."""
    from pyspark.sql.window import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        dround(F.avg("gap_us") / 1000000.0, 6).alias("avg_gap_s"),
        F.floor(F.max("gap_us") / 1000000).cast("bigint").alias("max_gap_s"),
    )


@register(
    "dml_scd2_intervals",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
chg AS (
  SELECT user_id, ts AS valid_from, event_type AS status
  FROM s WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, status, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL AS is_current
FROM chg
""",
)
def dml_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 construction: a per-key change
    stream collapses into validity intervals — consecutive equal statuses
    merge, each surviving change opens a row [valid_from, valid_to) closed
    by the next change, the last row is current. The history-table shape
    every warehouse keeps for point-in-time joins (which then run as as-of
    joins — join_asof — against these intervals).

    Shape: TWO window passes over the same per-key ordering (change
    detection via lag, interval close via lead) — one shuffle on user_id
    total, the second window reuses the first's partitioning and sort. No
    joins, no state beyond the frame row."""
    from pyspark.sql.window import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("event_type").alias("status"),
        )
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w2)
    return chg.select(
        "user_id",
        "status",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "rollup_ohlc_bars",
    oracle="""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL 15 MINUTE, ts) AS bar_start,
         value, ts, event_id
  FROM events),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bar_start
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bar_start
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b)
SELECT event_type, bar_start,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_events
FROM r GROUP BY event_type, bar_start
""",
)
def rollup_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the time-series downsampling workhorse
    (TimescaleDB `candlestick_agg`, kdb `xbar`): 15-minute buckets per
    event_type with open/high/low/close/volume. Open and close are exact
    selections via ``min_by``/``max_by`` over a (ts, event_id) struct key —
    deterministic under timestamp ties, and no float arithmetic touches the
    carried value, so the oracle comparison is bitwise.

    Scale shape: ONE hash shuffle on (event_type, bar); min_by/max_by/max/
    min/count all have partial (map-side) implementations, so 100 TB of
    events reduces to |types × bars| rows before the exchange. The oracle's
    two-window formulation would be a second sort — min_by folds it into
    the same aggregate. Bucketing is epoch-aligned `window()`, identical to
    DuckDB's time_bucket."""
    e = table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            "event_type",
            F.window("ts", "15 minutes").start.alias("bar_start"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "window_twap",
    oracle="""
WITH seq AS (
  SELECT event_type, value, ts,
         lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type,
       round(sum(value * (epoch(nxt) - epoch(ts)))
             / sum(epoch(nxt) - epoch(ts)), 6) AS twap,
       round(avg(value), 6) AS naive_avg,
       count(*) AS n_intervals
FROM seq WHERE nxt IS NOT NULL
GROUP BY event_type
""",
)
def window_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per event_type: each observation
    is weighted by how long it remained the latest one (lead(ts) - ts), the
    standard correction when sampling is irregular — a value that held for
    an hour should not count the same as one replaced in a second. The
    naive unweighted mean is emitted beside it so the bias is visible.

    Scale shape: one window pass partitioned by event_type (sort within
    partition, no cross-type traffic) feeding a partial-aggregable
    sum/sum division — the same single-exchange shape as the OHLC rollup.
    Ordering ties break on event_id so the lead() is deterministic; the
    final doubles are dround-ed because Spark and DuckDB sum the products
    in different orders."""
    from pyspark.sql.window import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    dt = F.unix_micros(F.lead("ts").over(w)) / 1e6 - F.unix_micros(F.col("ts")) / 1e6
    seq = e.select("event_type", "value", dt.alias("dt")).filter(
        F.col("dt").isNotNull()
    )
    return seq.groupBy("event_type").agg(
        dround(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias("twap"),
        dround(F.avg("value"), 6).alias("naive_avg"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


_HIST_BINS = 20


@register(
    "agg_histogram",
    oracle=f"""
WITH bounds AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT e.event_type,
         CAST(least(floor((e.value - b.lo) * {_HIST_BINS} / (b.hi - b.lo)),
                    {_HIST_BINS - 1}) AS INT) AS bin,
         b.lo, b.hi
  FROM events e CROSS JOIN bounds b)
SELECT event_type, bin,
       round(lo + bin * (hi - lo) / {_HIST_BINS}, 6) AS bin_lo,
       count(*) AS n
FROM binned GROUP BY event_type, bin, lo, hi
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per event_type over the global value range —
    the profiling/data-quality staple (numpy.histogram / DuckDB's
    histogram()): one min/max pre-pass fixes {_HIST_BINS} bins, each row
    maps to its bin with pure arithmetic, counts roll up per (type, bin).
    The top bin is closed (least(..., bins-1)) so the maximum lands inside
    the range, numpy's convention.

    Scale shape: the bounds aggregate is one partial-agg pass collapsing
    to a single broadcast-sized row; binning is a scan-stage expression
    (no shuffle); the count groupBy is the only exchange and carries at
    most |types| x {_HIST_BINS} groups out of the partials. Two passes over
    the data, zero sorts — the same plan a 100 TB profile run wants."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("lo")) * _HIST_BINS / (F.col("hi") - F.col("lo"))),
            F.lit(_HIST_BINS - 1),
        ).cast("int").alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("event_type", "bin", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        "bin",
        dround(F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / _HIST_BINS, 6).alias("bin_lo"),
        "n",
    )


@register(
    "agg_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type),
t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id)
SELECT c.user_id,
       CAST(t.tot AS BIGINT) AS n_events,
       round(-sum((CAST(n AS DOUBLE)/tot) * ln(CAST(n AS DOUBLE)/tot)), 6)
           AS type_entropy
FROM c JOIN t ON t.user_id = c.user_id
GROUP BY c.user_id, t.tot
HAVING CAST(t.tot AS BIGINT) >= 20
""",
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity / bot-detection profiling measure (a user whose
    entropy is ~0 does one thing; a scripted crawler's distribution is
    often suspiciously uniform ≈ ln(k)). Restricted to users with ≥20
    events so the estimate isn't dominated by tiny-sample noise.

    Scale shape: textbook two-level aggregation — the (user, type) count
    collapses in a partial agg before its exchange; the per-user total and
    the entropy fold both ride the SAME user_id grouping (one more
    exchange at most, carrying |users × types| rows, not events). No
    window, no sort. The -Σ p·ln p fold sums ≤ |event types| doubles per
    user, so cross-engine ordering noise is far below the 1e-6 round."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "tot")
        .agg(dround(-F.sum(p * F.log(p)), 6).alias("type_entropy"))
        .filter(F.col("tot") >= 20)
        .select(
            "user_id",
            F.col("tot").cast("bigint").alias("n_events"),
            "type_entropy",
        )
    )


@register(
    "agg_gini_concentration",
    oracle="""
WITH rev AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey,
         round(sum(o.o_totalprice), 2) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT seg, x,
         row_number() OVER (PARTITION BY seg ORDER BY x, o_custkey) AS rnk,
         count(*)     OVER (PARTITION BY seg)                        AS n
  FROM rev
)
SELECT seg,
       CAST(max(n) AS BIGINT) AS n_customers,
       round((2.0 * sum(rnk * x)) / (max(n) * sum(x))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM r GROUP BY seg
""",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    concentration scalar behind every whale-risk/fairness dashboard (0 =
    revenue spread evenly, →1 = one customer is the business), computed by
    the exact rank formula G = 2·Σ(r·x)/(n·Σx) − (n+1)/n over a
    deterministic (value, key) order. The classification twin is
    window_pareto_abc; this is the single-number inequality measure.

    Scale: one orders→customer join (customer side size-gated elsewhere;
    here the per-customer rollup comes first so the window input is
    customer-cardinality, not orders-cardinality), one rank window and one
    aggregate per segment — all partitioned on the segment. Inputs are
    rounded before the sums so both engines accumulate identical doubles."""
    from pyspark.sql.window import Window as W

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(gated_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(dround(F.sum("o_totalprice"), 2).alias("x"))
    )
    w = W.partitionBy("seg").orderBy("x", "o_custkey")
    r = rev.select(
        "seg",
        "x",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(W.partitionBy("seg")).alias("n"),
    )
    return r.groupBy("seg").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        dround(
            (2.0 * F.sum(F.col("rnk") * F.col("x")))
            / (F.max("n") * F.sum("x"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )

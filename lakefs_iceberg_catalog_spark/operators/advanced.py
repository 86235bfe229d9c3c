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
from .util import dround

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


@register("agg_quantile_approx")  # sketch-based — no exact oracle (accuracy tested)
def agg_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (KLL-style mergeable sketch): constant memory per
    group per partition — the 100 TB replacement for agg_quantile."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("p50_qty"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("p99_price"),
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

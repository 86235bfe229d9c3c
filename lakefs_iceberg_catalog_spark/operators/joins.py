"""Ring A — join family: inner/outer/semi/anti/cross equi-joins, theta/range
join, as-of join.

The reference exposes joins through stock Spark SQL (SURVEY.md §2.2); here
each join shape is declared so Catalyst can pick broadcast vs shuffle sides,
with explicit `F.broadcast` hints where the dimension side is provably small.

Scale notes (100 TB):
- Dimension tables (region/nation/customer-filtered) are broadcast — no
  shuffle of the fact side on those joins.
- Fact↔fact joins (lineitem↔orders) hash-shuffle both sides on the key; at
  1000 executors that's the intended co-partitioning (bucketing both tables
  on orderkey would remove even that — see catalog layer notes).
- The as-of join avoids a per-row subquery by union-tagging both streams and
  running one window pass — O(n log n) within each user partition, no
  cross-product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from ..tables import table
from .util import dround
from .util import local_df


@register(
    "join_inner_equi",
    oracle="""
SELECT n_name,
       count(*)                        AS n_orders,
       round(sum(o_totalprice), 2)     AS sum_total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join chain (fact→dim→dim) + aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey,
       count(o_orderkey)                         AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2)  AS sum_total
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (count of the
    null-extended column = 0, sum coalesced)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("sum_total"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
SELECT c_custkey,
       count(o_orderkey)                        AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS sum_total
FROM orders
RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("sum_total"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
WITH big_cust AS (
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
),
cust_orders AS (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT coalesce(b.c_custkey, co.o_custkey) AS custkey,
       coalesce(round(b.c_acctbal, 2), -1) AS acctbal,
       coalesce(co.n_orders, 0)            AS n_orders
FROM big_cust b
FULL OUTER JOIN cust_orders co ON b.c_custkey = co.o_custkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join where both sides have unmatched keys (high-balance
    customers vs per-customer order counts)."""
    big = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_acctbal")
    )
    co = table(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        big.join(co, big.c_custkey == co.o_custkey, "full_outer")
        .select(
            F.coalesce(big.c_custkey, co.o_custkey).alias("custkey"),
            F.coalesce(dround("c_acctbal", 2), F.lit(-1.0)).alias("acctbal"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "join_semi",
    oracle="""
SELECT c_nationkey, count(*) AS n_with_orders
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): emits each left row at most once; the right
    side is reduced to its join keys before the shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )


@register(
    "join_anti",
    oracle="""
SELECT c_nationkey, count(*) AS n_without_orders
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate > DATE '1998-06-01'
)
GROUP BY c_nationkey
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no *recent* orders.

    The right side is filtered to late-1998 orders so the anti-join result is
    non-empty at every scale factor — an empty result would make the oracle
    comparison vacuous (two empty sets always hash-match).  The date filter is
    pushed into the orders scan before the shuffle.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") > F.lit("1998-06-01").cast("date"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )


@register(
    "join_cross",
    oracle="""
SELECT r_name, n_name
FROM region
CROSS JOIN nation
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever between bounded dimension tables
    (5 × 25 rows); a cross join with a fact side would be rejected at review."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_theta_range",
    oracle="""
WITH tiers(tier, lo, hi) AS (
    VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000000.0)
)
SELECT t.tier,
       count(*)               AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e
JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: events banded into value tiers.

    Scale: the range side is a constant-size tier table → broadcast
    nested-loop join, which is O(n × tiers) with no shuffle of the fact
    table. Never range-join two fact tables directly — bucketize first.
    """
    e = table(spark, sf_dir, "events")
    tiers = local_df(spark, 
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1000000.0)],
        "tier string, lo double, hi double",
    )
    return (
        e.join(F.broadcast(tiers), (e.value >= tiers.lo) & (e.value < tiers.hi))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "join_asof",
    oracle="""
WITH purchases AS (
    SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
signups AS (
    SELECT user_id, ts, max(event_id) AS signup_event
    FROM events WHERE event_type = 'signup'
    GROUP BY user_id, ts
)
SELECT p.event_id,
       p.user_id,
       round(p.value, 2) AS value,
       s.ts              AS signup_ts
FROM purchases p
ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest signup at-or-before it
    (per user). Spark lacks a native ASOF — composed as union-tag + one
    ordered window pass per user (`last(..., ignorenulls)`), which is a single
    shuffle on user_id and never materializes a cross product.

    Scale: partition by user_id (high cardinality → even distribution);
    window sort is per-user, bounded by events-per-user, AQE re-splits skewed
    users. The DuckDB oracle uses its native ASOF JOIN as the semantic spec.
    """
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    # Collapse same-(user, ts) signups deterministically before the as-of so
    # ties cannot produce an ambiguous match (both engines agree).
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event"))
    )

    tagged = purchases.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lit(None).cast("timestamp").alias("sig_ts"),
        F.lit(1).alias("is_purchase"),
    ).unionByName(
        signups.select(
            "user_id",
            "ts",
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.col("ts").alias("sig_ts"),
            F.lit(0).alias("is_purchase"),
        )
    )
    # Order signups before purchases at identical ts so "at-or-before" is
    # inclusive, matching ASOF's p.ts >= s.ts.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("signup_ts", F.last("sig_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", dround("value", 2).alias("value"), "signup_ts")
    )


_SALT_BUCKETS = 8


@register(
    "join_salted_skew",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit two-phase salted JOIN — the deterministic fallback for
    hot keys that overflow even AQE's skew-join splitting: the fact side
    gets a salt from a column it already carries (l_linenumber mod 8 —
    deterministic, no RNG state), the dim side is replicated once per salt
    bucket via a literal-array explode, and the join runs on
    (key, salt) — a hot orderkey's rows now spread over 8 tasks instead
    of one. Salting MUST be result-invariant, which is exactly what the
    oracle checks: the plain unsalted join is the DuckDB side.

    At 100 TB the replicate factor trades dim-side volume (8× orders rows
    through the shuffle) for worst-task size; the same shape with the dim
    side broadcast drops the replication cost entirely when it fits."""
    li = table(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.col("l_linenumber"), F.lit(_SALT_BUCKETS))
    )
    o = table(spark, sf_dir, "orders").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_BUCKETS)]))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li._salt == o._salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@register(
    "join_fuzzy_levenshtein",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part),
t AS (SELECT p_name, string_split(p_name, ' ')[-1] AS noun FROM names)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching with token blocking — the entity-resolution
    join: distinct part names pair up within a blocking key (their noun
    token) and survive if edit distance ≤ 3. The blocking equi-join is the
    scale mechanism: candidates = pairs sharing a block, never all-pairs,
    the same output-sized-join discipline as the LSH band join — and
    levenshtein (quadratic per pair) runs only on blocked candidates.
    Both engines implement the same Wagner-Fischer distance, so the pair
    set hash-matches exactly."""
    names = (
        table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    )
    right = names.select(
        F.col("p_name").alias("name_b"), F.col("noun").alias("noun_r")
    )
    return (
        names.select(F.col("p_name").alias("name_a"), "noun")
        .join(
            right,
            (F.col("noun") == F.col("noun_r")) & (F.col("name_a") < F.col("name_b")),
        )
        .filter(F.levenshtein("name_a", "name_b") <= 3)
        .select(
            "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
        )
    )


_RANGE_WINDOW_US = 120_000_000  # 2-minute co-occurrence window


@register(
    "join_range_bucketized",
    oracle=f"""
WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pairs
FROM e a JOIN e b
  ON (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
 AND b.us - a.us <= {_RANGE_WINDOW_US}
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FACT-FACT range join via bucketization — the pattern SCALE.md
    mandates where neither side is broadcastable: ordered event pairs
    within a 2-minute window, counted per type pair (co-occurrence /
    session-stitching shape).

    Naively this is an O(n²) theta join (Spark would plan a cartesian).
    Instead both sides bucket time into window-sized cells; the LATER side
    expands to {{its bucket, its bucket − 1}} and the join becomes an
    EQUI-join on the bucket id — with the ordering constraint (earlier.us <
    later.us), a qualifying pair's buckets differ by at most one, and the
    two-cell expansion matches each pair EXACTLY once (same-bucket pairs
    via the identity cell, cross-boundary pairs via the −1 cell), so no
    dedup pass is needed. The residual range predicate filters inside the
    hash join. Cost: 2× one side through one shuffle, candidates bounded
    by pairs-per-bucket — never all-pairs. The same shape handles any
    band/interval join (as-of enrichment, sensor alignment) at 100 TB."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    a = e.select(
        F.col("event_id").alias("id_a"),
        F.col("event_type").alias("type_a"),
        F.col("us").alias("us_a"),
        F.floor(F.col("us") / _RANGE_WINDOW_US).alias("bk"),
    )
    b = e.select(
        F.col("event_id").alias("id_b"),
        F.col("event_type").alias("type_b"),
        F.col("us").alias("us_b"),
        F.explode(
            F.array(
                F.floor(F.col("us") / _RANGE_WINDOW_US) - 1,
                F.floor(F.col("us") / _RANGE_WINDOW_US),
            )
        ).alias("bk"),
    )
    pairs = a.join(b, "bk").filter(
        (
            (F.col("us_a") < F.col("us_b"))
            | ((F.col("us_a") == F.col("us_b")) & (F.col("id_a") < F.col("id_b")))
        )
        & (F.col("us_b") - F.col("us_a") <= _RANGE_WINDOW_US)
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH purchases AS (
    SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
signups AS (
    SELECT user_id, ts, max(event_id) AS signup_event
    FROM events WHERE event_type = 'signup'
    GROUP BY user_id, ts
)
SELECT p.event_id,
       p.user_id,
       round(p.value, 2) AS value,
       CASE WHEN s.ts >= p.ts - INTERVAL 24 HOUR THEN s.ts END AS signup_ts
FROM purchases p
ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof(tolerance=...)):
    each purchase matches its latest at-or-before signup only if it falls
    within the last 24 hours — staler matches become NULL, the semantics
    feature stores use so stale features never leak into training rows.

    Same single-shuffle union-tag + per-user window pass as join_asof (the
    tolerance is a post-window null-out, not a second join); the DuckDB
    oracle is native ASOF JOIN + the same bound. At 100 TB: one hash
    shuffle on user_id, per-user bounded sort, zero cross products."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event"))
    )
    tagged = purchases.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lit(None).cast("timestamp").alias("sig_ts"),
        F.lit(1).alias("is_purchase"),
    ).unionByName(
        signups.select(
            "user_id",
            "ts",
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.col("ts").alias("sig_ts"),
            F.lit(0).alias("is_purchase"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = F.last("sig_ts", ignorenulls=True).over(w)
    return (
        tagged.withColumn(
            "signup_ts",
            F.when(matched >= F.col("ts") - F.expr("INTERVAL 24 HOURS"), matched),
        )
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", dround("value", 2).alias("value"), "signup_ts")
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH purchases AS (
    SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
signups AS (
    SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup'
)
SELECT event_id, user_id, value, nearest_signup_ts
FROM (
  SELECT p.event_id, p.user_id, round(p.value, 2) AS value,
         s.ts AS nearest_signup_ts,
         row_number() OVER (
             PARTITION BY p.event_id
             ORDER BY abs(epoch(p.ts) - epoch(s.ts)), s.ts) AS rn
  FROM purchases p LEFT JOIN signups s ON p.user_id = s.user_id)
WHERE rn = 1
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: each purchase matched to the closest signup in
    EITHER direction (ties at equal distance break to the earlier signup) —
    the sensor-fusion / quote-matching variant where "latest before" is
    wrong when the next reading is closer. Spark has no native ASOF at
    all; pandas' merge_asof(direction='nearest') is the semantic spec.

    Composed, like join_asof, without any pair join: union-tag the two
    streams, then TWO frame-bounded window passes over the SAME user_id
    exchange (Catalyst sorts twice but shuffles once) — a backward
    last-non-null and a forward first-non-null — and a scalar least-delta
    pick between the two candidates. The oracle pays the per-user pair
    join + rank; this plan never builds it: cost is one shuffle of
    |events|, state one user's rows. Equal-timestamp rows order
    signup-first in BOTH directions, so a same-instant signup matches at
    distance zero, matching the oracle's abs()=0 rank."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    signups = (
        e.filter(F.col("event_type") == "signup").select("user_id", "ts").distinct()
    )
    tagged = purchases.select(
        "user_id", "ts", "event_id", "value",
        F.lit(None).cast("timestamp").alias("sig_ts"),
        F.lit(1).alias("is_purchase"),
    ).unionByName(
        signups.select(
            "user_id", "ts",
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.col("ts").alias("sig_ts"),
            F.lit(0).alias("is_purchase"),
        )
    )
    w_bwd = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_purchase").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_purchase").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cand = (
        tagged.withColumn("bwd_ts", F.last("sig_ts", ignorenulls=True).over(w_bwd))
        .withColumn("fwd_ts", F.last("sig_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_purchase") == 1)
    )
    d_bwd = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("bwd_ts"))
    d_fwd = F.unix_micros(F.col("fwd_ts")) - F.unix_micros(F.col("ts"))
    nearest = (
        F.when(F.col("bwd_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("bwd_ts"))
        # tie (equal distance) → earlier signup = the backward candidate
        .when(d_bwd <= d_fwd, F.col("bwd_ts"))
        .otherwise(F.col("fwd_ts"))
    )
    from .util import dround

    return cand.select(
        "event_id", "user_id",
        dround("value", 2).alias("value"),
        nearest.alias("nearest_signup_ts"),
    )


@register(
    "join_interval_overlap",
    oracle="""
WITH o AS (
    SELECT user_id, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
m AS (
    SELECT user_id, ts, event_id,
           CASE WHEN prev_ts IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM o
),
s AS (
    SELECT user_id, ts,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM m
),
iv AS (
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS s0,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS s1
    FROM s GROUP BY user_id, session_id HAVING count(*) >= 2
),
p AS (
    SELECT greatest(a.s0, b.s0) AS o0, least(a.s1, b.s1) AS o1
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.s0 <= b.s1 AND b.s0 <= a.s1
)
SELECT CAST(o0 // 86400 AS BIGINT)   AS epoch_day,
       CAST(count(*) AS BIGINT)      AS n_pairs,
       CAST(sum(o1 - o0) AS BIGINT)  AS total_overlap_s,
       CAST(max(o1 - o0) AS BIGINT)  AS max_overlap_s
FROM p GROUP BY 1 ORDER BY 1
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP SELF-JOIN — the "which intervals intersect" shape
    (concurrent sessions, conflicting reservations, co-occurring incidents)
    that Spark has no native operator for and a naive formulation computes
    as an O(n²) theta join: here multi-event user sessions (30-min-gap
    sessionization, ≥2 events) pair up when their [start, end] spans
    intersect, aggregated to per-day concurrency stats.

    The engine's plan is the standard BUCKETIZED interval join: each
    interval explodes into the hour buckets it covers, candidates come
    from a bucket EQUI-join (self-join with renamed keys — an alias-only
    self-join degenerates to a nested loop), the overlap predicate
    verifies exactly, and the count-once rule `bucket ==
    floor(greatest(start_a, start_b)/3600)` deduplicates pairs that share
    several buckets without a distinct. The DuckDB oracle runs the PLAIN
    quadratic predicate join — proving the bucketed plan computes the
    identical pair set.

    Scale (100 TB): candidates are sum over buckets of (intervals in
    bucket)², never corpus² — bounded by within-hour concurrency exactly
    like the LSH band joins bound near-dup candidates; all integer
    arithmetic (epoch seconds, `div`), so both engines replay bit-for-bit.
    Skewed buckets (a thundering-herd hour) would salt the bucket key the
    same way join_salted_skew does."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tsl = F.col("ts").cast("long")
    gap = tsl - F.lag(tsl).over(w)
    marked = e.select(
        "user_id", "ts", "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    iv = (
        marked.withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min(tsl).alias("s0"),
            F.max(tsl).alias("s1"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    left = iv.select(
        F.col("user_id").alias("ua"), F.col("s0").alias("a0"),
        F.col("s1").alias("a1"),
        F.explode(F.sequence(F.expr("s0 div 3600"), F.expr("s1 div 3600"))).alias("bucket"),
    )
    right = iv.select(
        F.col("user_id").alias("ub"), F.col("s0").alias("b0"),
        F.col("s1").alias("b1"),
        F.explode(F.sequence(F.expr("s0 div 3600"), F.expr("s1 div 3600"))).alias("bucket"),
    )
    pairs = left.join(right, "bucket").filter(
        (F.col("ua") < F.col("ub"))
        & (F.col("a0") <= F.col("b1"))
        & (F.col("b0") <= F.col("a1"))
        # count-once rule: only the bucket holding the later start emits
        & (F.col("bucket") == F.expr("greatest(a0, b0) div 3600"))
    )
    o0, o1 = F.greatest("a0", "b0"), F.least("a1", "b1")
    return (
        pairs.select(
            F.expr("greatest(a0, b0) div 86400").cast("bigint").alias("epoch_day"),
            (o1 - o0).alias("ov"),
        )
        .groupBy("epoch_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("ov").cast("bigint").alias("total_overlap_s"),
            F.max("ov").cast("bigint").alias("max_overlap_s"),
        )
        .orderBy("epoch_day")
    )


_BLOOM_WORDS = 1024  # 64 Kibit filter — fixed-size plan metadata
_BLOOM_SEEDS = (1, 2, 3)


@register(
    "join_bloom_prefilter",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)        AS n_lines,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMI-JOIN REDUCTION via an explicit BLOOM runtime filter — the
    classic 100 TB move for a selective dim⋈fact join (Spark's own
    runtime row-level filtering does this behind
    spark.sql.optimizer.runtime.bloomFilter; here it is built as a
    first-class operator so the technique is inspectable and testable):
    the dim side's join keys fold into a fixed 64 Kibit Bloom filter
    (k=3 xxhash64 probes, bit_or-aggregated into 1024 longs — METADATA
    sized, independent of data scale), which embeds in the fact scan as
    a pure literal-array expression — candidate rows that cannot match
    never leave the scan stage, shrinking the semi-join's shuffle to
    candidates only. The exact semi join then removes Bloom false
    positives, so results are byte-identical to the plain semi join the
    DuckDB oracle runs.

    Scale (100 TB): the filter build is one partial-agg groupBy over
    dim keys; the 8 KiB bit array rides the plan (driver materialization
    bounded at 1024 rows via bounded_rows); the fact side reads with the
    prefilter inside whole-stage codegen before the only shuffle. False
    positive rate at |keys| ≈ m/16: ~2.5% extra candidates — the shuffle
    shrinks by the dim's true selectivity."""
    from .util import bounded_rows

    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    keys = supp.select("s_suppkey").distinct()

    # fold dim keys into the bit array: one row per populated word
    nbits = _BLOOM_WORDS * 64
    bits = None
    for seed in _BLOOM_SEEDS:
        one = keys.selectExpr(
            f"cast(pmod(xxhash64(s_suppkey, {seed}), {nbits}) div 64 as int)"
            " as word",
            f"shiftleft(1L, cast(pmod(xxhash64(s_suppkey, {seed}), {nbits}) % 64"
            " as int)) as mask",
        )
        bits = one if bits is None else bits.unionByName(one)
    words = [0] * _BLOOM_WORDS
    for r in bounded_rows(bits.groupBy("word").agg(F.bit_or("mask").alias("m"))):
        words[r["word"]] = r["m"]
    # ONE array Literal leaf (F.lit of the list), not CreateArray of 1024
    # child literals: the probe references the array three times, and the
    # 3×1024-node expression trees cost ~3 s of analysis+codegen per plan
    # compile at ANY data size; as a single leaf the plan is constant-sized.
    bloom = F.lit([int(w) for w in words])

    # fact-side prefilter: every probe bit must be set (scan-stage expr)
    cond = F.lit(True)
    for seed in _BLOOM_SEEDS:
        idx = F.pmod(F.xxhash64("l_suppkey", F.lit(seed)), F.lit(nbits))
        word = F.element_at(bloom, (idx / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64(l_suppkey, {seed}), {nbits}) % 64"
            " as int))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    candidates = li.filter(cond)

    # exact semi join kills false positives — results == plain semi join
    exact = candidates.join(keys, candidates.l_suppkey == keys.s_suppkey, "semi")
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_dynamic_partition_pruning",
    oracle="""
SELECT c_nationkey,
       count(*)                    AS n_cust,
       round(sum(c_acctbal), 2)    AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE n_regionkey = 2
GROUP BY c_nationkey
""",
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING over a partition-laid-out fact table — the
    star-join optimization that makes selective dim⋈fact joins IO-bounded
    by the SELECTED partitions at 100 TB: the fixture lays customer out
    partitioned by c_nationkey (the physical layout a real deployment
    keys to its dominant join column), joins it to nation filtered to one
    region, and Catalyst injects the dim side's join keys as a runtime
    partition filter INTO THE FACT SCAN (reusing the broadcast exchange —
    `dynamicpruningexpression` in the scan's PartitionFilters, asserted
    mid-flow), so only 5 of 25 partition directories are ever opened.
    Where `join_bloom_prefilter` prunes ROWS inside scanned files, DPP
    prunes whole PARTITIONS before any file opens — the two runtime
    filters compose at scale.

    Scale (100 TB): the pruning subquery evaluates the already-broadcast
    dim keys — zero extra passes; fact IO drops from O(table) to
    O(matching partitions), the same plan shape Spark runs on a
    1000-executor star join."""
    import shutil as _shutil
    import tempfile as _tempfile

    from .util import bounded_rows

    c = table(spark, sf_dir, "customer")
    tmp = _tempfile.mkdtemp(prefix="dpp-")
    c.write.mode("overwrite").partitionBy("c_nationkey").parquet(tmp)
    fact = spark.read.parquet(tmp)
    dim = table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    j = (
        fact.join(F.broadcast(dim), fact.c_nationkey == dim.n_nationkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            dround(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )
    plan = j._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, "DPP filter missing from the fact scan"
    rows, schema = bounded_rows(j), j.schema
    _shutil.rmtree(tmp, ignore_errors=True)
    return local_df(spark, rows, schema)

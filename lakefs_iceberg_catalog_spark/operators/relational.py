"""Ring A — core relational operators (scan / project / filter / aggregate /
sort / limit / set ops / subqueries / pivot).

The reference exposes this surface through stock Spark SQL (SURVEY.md §2.2 —
`pom.xml:90-95` pins spark-sql, `tests/conftest.py:63-78` builds an
unrestricted session); we re-declare each capability with the public DataFrame
API so Catalyst owns the physical plan.

Scale notes (100 TB):
- Aggregations here group on low-cardinality keys → partial (map-side)
  aggregation collapses each partition to a handful of rows before the
  shuffle; the shuffle moves O(groups × partitions), not O(rows).
- Filters/projections are expressed on base columns so they reach the parquet
  scan (PushedFilters / ReadSchema — audited in tests/test_plans.py).
- Oracle determinism: double aggregates are rounded (sums → 2dp, avgs/ratios
  → 4-6dp) in BOTH dialects; LIMIT queries always carry a total order with a
  unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from ..tables import table
from .util import dround, gated_broadcast


# --------------------------------------------------------------------------
# flagship: TPC-H Q3-shaped pricing/revenue ranking
# (scan_table + filter_predicate + join_inner_equi + agg_hash_group +
#  sort_order_by + limit — SURVEY.md §7 Phase 0)
# --------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate  > TIMESTAMP '1999-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("flagship_top_unshipped", oracle=_FLAGSHIP_ORACLE)
def flagship_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 highest-revenue not-yet-shipped orders for one market segment.

    Scale: customer is the small side → Catalyst broadcast-joins it against
    orders (verified in plan audit); lineitem↔orders is a shuffle join on the
    join key with partial aggregation on l_orderkey before the final sort;
    top-10 is a TakeOrderedAndProject (no global sort materialization).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by supplier nation where customer and
    supplier share a nation, one region, one order year — the classic
    6-way join.

    Scale: nation/region broadcast explicitly (constant-size dims); the
    lineitem↔orders spine is the one big shuffle join; supplier and
    customer ride hash joins on their keys (AQE picks broadcast while they
    fit, shuffle-hash beyond); the c_nationkey = s_nationkey equality is a
    post-join conjunct on already-joined rows, not an extra shuffle; the
    5-nation aggregate collapses map-side."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q18_large_volume",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS total,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 180
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (total quantity over the
    threshold) with their customers, top-100 by order value.

    Scale: the qualifying-keys aggregate is a partial-agg groupBy on
    l_orderkey — the SAME key the lineitem↔orders join shuffles on, so at
    cluster scale the shuffle partitioning carries over (locally the small
    sides collapse to broadcasts instead); the IN becomes a semi-join of
    orders against the qualifying keys; customer rides a hash join; top-100
    is TakeOrderedAndProject, never a global sort."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 180)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dround(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            dround("o_totalprice", 2).alias("total"), "sum_qty",
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    items in one quarter.

    Scale: both selective filters (order quarter, return flag) push into
    their scans; lineitem↔orders shuffles once on the order key; customer
    joins on its key and nation broadcasts; the per-customer aggregate is
    partial-then-final, and top-20 on the rounded revenue (identical
    rounding both engines, unique custkey tiebreak) plans as
    TakeOrderedAndProject."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            dround("c_acctbal", 2).alias("acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle="""
SELECT date_trunc('month', l_shipdate) AS ship_month,
       round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of monthly revenue — the
    fact↔mid-dimension join with conditional aggregation.

    Scale: part is the broadcast side (explicitly hinted — at 100 TB part
    is GBs against lineitem's TBs, still broadcastable or a shuffle-hash
    join, never sort-merge on the fact); the ship-date filter pushes into
    the lineitem scan; both sums fold map-side per month before the single
    12-group exchange."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            dround(100.0 * F.sum(promo_rev) / F.sum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — the canonical selective
    single-scan aggregate.

    Scale: all three predicates push into the parquet scan (shipdate +
    discount + quantity ranges land in PushedFilters, so row groups outside
    the year skip on footer stats); the aggregate is a map-side partial sum
    with a single 1-row exchange — the whole query is one WholeStageCodegen
    pass over the surviving rows."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# scan / project / filter
# --------------------------------------------------------------------------

@register(
    "scan_table",
    oracle="""
SELECT r_regionkey, r_name FROM region
""",
)
def scan_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain catalog-table scan (reference: `spark.read.table(...)`,
    tests/test_iceberg.py:15-16). Here: parquet scan, full schema."""
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "project_select",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged,
       l_returnflag || '/' || l_linestatus AS flag_status
FROM lineitem
WHERE l_linenumber = 1
""",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with column arithmetic + aliasing; only 7 of 11 lineitem
    columns are referenced → ReadSchema prunes the scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2).alias("charged"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@register(
    "filter_predicate",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS total
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice BETWEEN 1000 AND 50000
  AND o_orderpriority LIKE '%URGENT'
  AND o_custkey IS NOT NULL
""",
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: IN, BETWEEN, LIKE, null test — all pushable to
    the parquet row-group level except LIKE (evaluated post-scan)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("F", "P"))
        .filter(F.col("o_totalprice").between(1000, 50000))
        .filter(F.col("o_orderpriority").like("%URGENT"))
        .filter(F.col("o_custkey").isNotNull())
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", dround("o_totalprice", 2).alias("total"))
    )


# --------------------------------------------------------------------------
# aggregation family
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2-key group, 8 aggregates.

    Scale: ~6 groups → partial aggregation reduces each of N scan partitions
    to ≤6 rows; the exchange is negligible at any SF.
    """
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(F.sum(disc), 2).alias("sum_disc_price"),
            dround(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
            dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_hash_group",
    oracle="""
SELECT l_suppkey,
       count(*)                         AS n_items,
       round(sum(l_quantity), 2)        AS sum_qty,
       round(min(l_extendedprice), 2)   AS min_price,
       round(max(l_extendedprice), 2)   AS max_price
FROM lineitem
GROUP BY l_suppkey
""",
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation on a mid-cardinality key (suppkey).

    Scale: hash-partitioned shuffle on l_suppkey; skewed suppliers are
    re-split by AQE skew handling; count/sum/min/max all have partial forms.
    """
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.min("l_extendedprice"), 2).alias("min_price"),
            dround(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*)                  AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — Catalyst expands to a two-phase aggregate (distinct
    keys first, then counts) so the distinct shuffle is on (group, value)
    pairs, never a driver-side set."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_approx_distinct",
    # The sketch value itself is engine-specific, so the driver-checked
    # contract is the ACCURACY CLAIM: the HLL++ estimate must land within
    # 3×rsd of the exact count. The oracle states what a correct sketch
    # must produce — TRUE per group, plus the exact counts both engines
    # can compute. A broken sketch (or a broken bound) hash-mismatches.
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
       CAST(count(*) AS BIGINT)                  AS n_rows,
       TRUE                                      AS within_bound
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (`approx_count_distinct`) with its
    accuracy check folded into the result.

    Scale: constant-size sketch per group per partition, merged on the
    reduce side — the canonical 100 TB replacement for exact distinct. The
    exact count rides the same single aggregate (Catalyst plans distinct +
    sketch in one two-phase agg), and the output asserts
    |approx − exact| ≤ 3·rsd·exact, the standard HLL++ 3σ envelope.
    """
    rsd = 0.02
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_exact"),
            F.approx_count_distinct("l_partkey", rsd).alias("n_approx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "n_exact",
            "n_rows",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= 3 * rsd * F.col("n_exact")
            ).alias("within_bound"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (subtotals + grand total). Catalyst expands to a single Expand +
    aggregate — one pass over the data regardless of grouping-set count."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 2) AS sd_price,
       round(var_samp(l_quantity), 4)         AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(median(l_quantity), 2)           AS med_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/median).

    Scale: stddev/var/corr use single-pass merge-able moments; exact median
    requires a sort-based aggregate — at 100 TB prefer percentile_approx
    (see agg_approx_distinct for the sketch pattern).
    """
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dround(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            dround(F.var_samp("l_quantity"), 4).alias("var_qty"),
            dround(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            dround(F.median("l_quantity"), 2).alias("med_qty"),
        )
    )


# --------------------------------------------------------------------------
# sort / limit / top-k
# --------------------------------------------------------------------------

@register(
    "sort_order_by",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total, o_orderpriority
FROM orders
ORDER BY total DESC, o_orderkey ASC
LIMIT 100
""",
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort + limit. Catalyst turns sort+limit into
    TakeOrderedAndProject: per-partition top-100 then a single merge — no
    full range-shuffle sort at any scale."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", dround("o_totalprice", 2).alias("total"), "o_orderpriority")
        .orderBy(F.col("total").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "limit_topk",
    oracle="""
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn <= 5
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (unique tiebreak on o_orderkey).

    Scale: one shuffle on the partition key; Spark inserts a per-partition
    WindowGroupLimit (rank pushdown) so each task keeps only K rows per group
    before the exchange.
    """
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", dround("o_totalprice", 2).alias("total"))
    )


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------

@register(
    "set_union",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics) = unionByName + distinct."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "2-HIGH").select(F.col("o_custkey").alias("custkey"))
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1998-01-01'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers minus customers with 1998 orders via EXCEPT (set difference).

    The subtracted side is filtered so the difference is non-empty at every
    scale factor; an empty difference would make the oracle row vacuous.
    """
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.exceptAll(o).distinct()


# --------------------------------------------------------------------------
# subqueries
# --------------------------------------------------------------------------

@register(
    "subquery_scalar",
    oracle="""
SELECT o_orderstatus,
       count(*)                    AS n_big,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
""",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate — Catalyst plans the inner aggregate
    once and broadcasts the scalar into the filter (no per-row re-execution)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*)                    AS n_big,
               round(sum(o_totalprice), 2) AS sum_total
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        """
    )


@register(
    "subquery_in",
    oracle="""
SELECT c_nationkey, count(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — decorrelated by Catalyst into a left-semi join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("customer")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_customers
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        """
    )


# --------------------------------------------------------------------------
# pivot
# --------------------------------------------------------------------------

@register(
    "pivot_wide",
    oracle="""
SELECT l_returnflag,
       round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_f,
       round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_o
FROM lineitem
GROUP BY l_returnflag
""",
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide with an explicit value list (explicit list keeps the
    plan a single pass; omitting it would trigger a distinct-values pre-query)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            dround(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_f"),
            dround(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_o"),
        )
    )


@register(
    "agg_string_collect",
    oracle="""
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_custkey) AS names,
       count(*) AS n
FROM (SELECT * FROM customer WHERE c_custkey <= 200)
GROUP BY c_nationkey
""",
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect (key, name) structs,
    sort the array (deterministic merge order regardless of partitioning),
    project names, join. The collect is bounded by the group size — at
    100 TB this is only safe on bounded groups (here: ≤200 customers)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("c_custkey", "c_name"))),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("names"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "subquery_correlated",
    oracle="""
SELECT c_custkey,
       (SELECT round(max(o_totalprice), 2) FROM orders WHERE o_custkey = c_custkey) AS max_order,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)  AS n_orders
FROM customer
WHERE c_custkey <= 500
""",
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries — Catalyst decorrelates both into ONE
    left outer aggregate join on o_custkey (verify with .explain: no
    per-row re-execution, no nested loops)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT round(max(o_totalprice), 2) FROM orders WHERE o_custkey = c_custkey) AS max_order,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
        WHERE c_custkey <= 500
        """
    )


@register(
    "set_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics (min multiplicity per side)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicities subtract)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


@register(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^k grouping sets in a single Expand+aggregate pass
    (rollup's sibling; same one-scan property at any scale)."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
SELECT r_name, n_name,
       count(*) AS n_rows,
       round(sum(s_acctbal), 2) AS sum_bal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — the hierarchical subset of CUBE's grouping sets
    ((r, n), (r), ()) in one Expand+aggregate pass over a dim-broadcast
    join: region and nation are broadcast (tiny dims), supplier streams,
    and the rollup adds k+1 expanded rows per input row before the partial
    agg — no extra scan or shuffle beyond the single agg exchange."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dround(F.sum("s_acctbal"), 2).alias("sum_bal"),
        )
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: total order (unique tiebreak) + offset + limit. Spark
    plans offset+limit together (GlobalLimit with skip) — still a single
    per-partition top-(offset+limit) then merge, no full sort."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", dround("o_totalprice", 2).alias("total"))
        .orderBy(F.col("total").desc(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
    )


@register(
    "agg_count_min_sketch",
    # Same accuracy-contract design as agg_approx_distinct: the sketch
    # bytes are engine-specific, so the driver-checked claim is Count-Min's
    # GUARANTEE — estimates never undercount, and overcount stays within
    # eps·N at the sketch's confidence (overwhelming at eps=0.1%, 3 keys).
    # Keyed on l_returnflag: the trimmed testdata has no l_shipmode
    # (tpch_extra.py documents the trim; Q12 uses l_linestatus the same way).
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_exact,
       TRUE                     AS never_undercounts,
       TRUE                     AS within_eps_n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation, built distributed from
    DataFrame ops (PySpark exposes no Dataset.stat.countMinSketch, and the
    SQL ``count_min_sketch`` aggregate returns opaque engine-private bytes
    — so the sketch's d×w counter table is materialized directly: each row
    explodes into d (depth, xxhash64-bucket) cells, a groupBy(depth,
    bucket) with map-side partial aggregation sums them, and a per-key
    probe takes min-over-depths). The result folds CMS's two-sided
    contract per key: the estimate can never undercount (hash-collision
    cells only add), and overcounts by at most eps·N with probability
    ≥ confidence.

    Scale: the counter table is ≤ d·w cells regardless of data size — the
    100 TB path for per-key frequencies over unbounded key domains where
    an exact groupBy would shuffle the world; here the exact counts ride
    along (computable at fixture scale) to PROVE the bounds. The d-way row
    explosion collapses in the partial-aggregate stage (per-partition
    output is ≤ d·w cells, not d·rows); the probe join is an equi-join of
    a 3-key broadcast side against the tiny cell table — no data funnel,
    one bounded_rows probe for N."""
    import math

    eps, confidence = 0.001, 0.99
    w = int(math.ceil(math.e / eps))            # 2719 buckets per depth
    d = int(math.ceil(math.log(1.0 / (1.0 - confidence))))  # 5 depths
    li = table(spark, sf_dir, "lineitem").select("l_returnflag")
    cells_arr = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                F.pmod(
                    F.xxhash64(F.lit(j), F.col("l_returnflag")), F.lit(w)
                ).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    cells = (
        li.select(F.explode(cells_arr).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_exact"))
    from .util import bounded_rows

    n_total = sum(r["n_exact"] for r in bounded_rows(exact))  # 3 flags
    # probe: each key's d cells, min over depths = the CMS estimate
    probes = exact.select(
        "l_returnflag", "n_exact", F.explode(cells_arr).alias("c")
    ).select(
        "l_returnflag",
        "n_exact",
        F.col("c.depth").alias("depth"),
        F.col("c.bucket").alias("bucket"),
    )
    est = (
        F.broadcast(probes)
        .join(cells, ["depth", "bucket"], "inner")
        .groupBy("l_returnflag", "n_exact")
        .agg(F.min("cnt").alias("est"))
    )
    return est.select(
        "l_returnflag",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (F.col("est") >= F.col("n_exact")).alias("never_undercounts"),
        (F.col("est") <= F.col("n_exact") + F.lit(eps * n_total)).alias(
            "within_eps_n"
        ),
    )


@register(
    "agg_hyperloglog_native",
    # The register values are engine-internal, so the driver-checked
    # contract is the ACCURACY CLAIM (the agg_approx_distinct pattern):
    # the from-scratch HLL estimate must land within the standard 3σ
    # envelope (3·1.04/√m) of the exact distinct count — plus the exact
    # counts both engines can compute. A broken hash split, rho, or
    # small-range correction hash-mismatches.
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
       CAST(count(*) AS BIGINT)                  AS n_rows,
       TRUE                                      AS within_bound
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_hyperloglog_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built FROM SCRATCH as DataFrame operations (the sketch
    the built-in approx_count_distinct wraps, reconstructed so the
    distributed mechanics are inspectable — the companion to the
    DataFrame-native Count-Min sketch): xxhash64 splits into an 11-bit
    register index + 53-bit suffix, rho = leading-zero count + 1 via the
    EXACT integer bit length (`length(bin(w))` — no float log2, whose
    boundary rounding could skew registers), registers are a
    (group, bucket) MAX aggregate — the map-side-combinable, constant-
    size-per-group state that makes HLL the 100 TB distinct — then the
    harmonic estimate with the small-range linear-counting correction
    (Flajolet et al. 2007). The estimate must sit inside the 3σ envelope
    per group, asserted against the exact count in the same result.

    Scale: two partial aggs (register max, then per-group fold over ≤2048
    register rows) — the sketch state is 2048 rows per group regardless
    of cardinality; the exact count rides a separate agg ONLY to state
    the oracle contract (a production user runs just the sketch side)."""
    p, m = 11, 2048
    alpha = 0.7213 / (1 + 1.079 / m)
    li = table(spark, sf_dir, "lineitem")
    h = F.xxhash64("l_partkey")
    w = F.expr("shiftrightunsigned(xxhash64(l_partkey), 11)")
    rho = F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(64 - p + 1) - F.length(F.expr("bin(shiftrightunsigned(xxhash64(l_partkey), 11))"))
    )
    regs = (
        li.select(
            "l_returnflag",
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    stats = regs.groupBy("l_returnflag").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("s"),
        F.count(F.lit(1)).alias("present"),
    )
    zeros = F.lit(m) - F.col("present")
    raw = F.lit(alpha * m * m) / (F.col("s") + zeros)  # empty regs: 2^-0
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(m) * F.log(F.lit(m) / zeros)
    ).otherwise(raw)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_exact"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    bound = 3 * 1.04 / (m ** 0.5)
    return exact.join(stats.withColumn("est", est), "l_returnflag").select(
        "l_returnflag",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        "n_rows",
        (F.abs(F.col("est") - F.col("n_exact")) <= F.lit(bound) * F.col("n_exact")).alias(
            "within_bound"
        ),
    )

"""Ring A — additional classic multi-join benchmark shapes (TPC-H Q4/Q7/Q12/
Q13/Q15/Q17/Q19/Q22), adapted to the trimmed testdata schema.

The reference exposes this surface through stock Spark SQL (SURVEY.md §2.2 —
`pom.xml:90-95` pins spark-sql; the session grammar is unrestricted), so each
shape here is plain DataFrame API with Catalyst owning the physical plan.
Adaptations for the trimmed columns (no l_shipmode/l_commitdate/l_receiptdate,
no partsupp, no c_phone): Q4's lateness predicate becomes l_shipdate >
o_orderdate, Q12's shipmode dimension becomes l_linestatus, Q17's container
filter becomes brand-only, Q22's country code becomes c_mktsegment and the
"no orders" anti-join is time-windowed (every sf0.01 customer has *some*
order). The join/agg/subquery structure of each query is preserved.

Scale notes (100 TB) are per-operator docstrings; the common principles:
selective filters sit on base columns so they push into the parquet scans,
constant-size dims are broadcast explicitly, the lineitem↔orders spine is
the only big shuffle, and every aggregate is partial-before-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .util import dround, gated_broadcast


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one line shipped
    after the order date, counted by priority (EXISTS → left-semi join).

    Scale: the quarter filter pushes into the orders scan; the EXISTS plans
    as a left-semi join on the order key — lineitem never expands the result
    (first match wins, no dedup pass); the 5-row priority aggregate collapses
    map-side before one tiny shuffle."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by year
    — the supplier-nation × customer-nation double-dimension join.

    Scale: both nation sides are broadcast (constant-size dim joined twice
    under different aliases); the pair predicate is evaluated on the already-
    joined row, not as a cross-filter shuffle; lineitem↔orders is the single
    big shuffle; the ≤4-group aggregate collapses map-side. The two-year
    shipdate filter pushes into the lineitem scan."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dround(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q12_priority_lines",
    oracle="""
SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'N'
  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counting of high- vs low-priority orders
    per line class (shipmode dimension → l_linestatus in the trimmed schema).

    Scale: the year + returnflag filters push into the lineitem scan before
    the join; the conditional counts are expressions inside a partial
    aggregate — one shuffle on the 2-value group key after the orders join
    (itself the single spine shuffle on the order key)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, with a
    join-time (not post-join) filter on the outer side — the classic
    "count including zeros" left-outer aggregate.

    Scale: the orders filter is part of the join condition so NULL-extension
    still produces c_count=0 customers; the first aggregate shuffles on
    c_custkey (the same key the join shuffles on → exchange reuse); the
    second aggregate is over ~distinct-count-many rows, collapsing map-side."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    an aggregate reused both as join input and as a scalar-max subquery.

    Scale: the revenue aggregate is computed ONCE (the DataFrame is reused
    for both the max and the equality filter — Spark reuses the exchange);
    the scalar max is a 1-row broadcast crossed into the filter, and the
    supplier dim rides a broadcast hash join. Revenue is rounded identically
    in both engines before the equality, so the knife-edge max comparison is
    on stable 2dp values."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    supp = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("_max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey) t ON p_partkey = a_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < qty_thresh
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand's
    parts, with the per-part average quantity as a correlated threshold.

    Scale: the brand filter cuts part to a small dim that is broadcast; the
    correlated avg decorrelates to a groupBy on l_partkey over the SAME
    brand-restricted lineitem subset (the semi-filter through the broadcast
    happens before the threshold agg, so the avg never scans non-qualifying
    parts' rows); threshold join and main join share the l_partkey shuffle
    key. Final single-row aggregate is a partial-agg collapse."""
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = table(spark, sf_dir, "lineitem").join(
        gated_broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    thresh = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(thresh, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(dround(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_parts",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicates spanning
    both join sides — the classic OR-of-ANDs that defeats naive pushdown.

    Scale: Catalyst extracts the part-only disjunction (brand ∈ {1,2,3} union
    of size ranges) and pushes it into the part scan, and the l_quantity
    bounds (1..30 overall) into the lineitem scan, leaving the cross-side
    residual on the joined row; part after pushdown is small → broadcast
    equi-join on the part key, never a cartesian."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    joined = li.join(gated_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    d1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(d1 | d2 | d3).agg(
        dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
WITH avg_bal AS (SELECT round(avg(c_acctbal), 6) AS ab FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (country code → c_mktsegment; the anti-join is time-windowed
    because every sf0.01 customer has some historical order).

    Scale: the scalar avg is a 1-row broadcast cross (no shuffle of
    customer); the NOT EXISTS plans as a left-anti join against the
    date-filtered orders — the date filter pushes into the orders scan so
    the anti side is a fraction of the table; the 5-group aggregate
    collapses map-side."""
    cust = table(spark, sf_dir, "customer")
    # The threshold is rounded to a fixed scale on BOTH sides (dround here,
    # round() in the oracle): Spark and DuckDB sum doubles in different
    # orders, so a balance within an ULP of the raw mean could flip
    # membership across engines — same guard q15 uses for its max-equality.
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(dround(F.avg("c_acctbal"), 6).alias("ab"))
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )

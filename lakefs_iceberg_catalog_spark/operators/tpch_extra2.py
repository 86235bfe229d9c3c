"""Ring A — the remaining classic TPC-H shapes (Q2/Q3/Q8/Q9/Q11/Q16/Q20/Q21),
completing the 22-query suite, adapted to the trimmed testdata schema.

The reference exposes this surface through stock Spark SQL (SURVEY.md §2.2 —
`pom.xml:90-95` pins spark-sql; the session grammar is unrestricted), so each
shape is plain DataFrame API with Catalyst owning the physical plan.

Adaptations for the trimmed columns (no partsupp table, no ps_supplycost /
ps_availqty, no l_commitdate/l_receiptdate, no p_container/p_mfgr): the
part↔supplier bridge everywhere partsupp appears is the DISTINCT
(l_partkey, l_suppkey) pairs actually traded; Q2's min-cost supplier becomes
min-acctbal supplier; Q9's supply cost becomes 10% of retail price; Q11's
stock value becomes traded value; Q16's complaint exclusion becomes negative
account balance; Q20's availqty threshold becomes shipped-quantity threshold;
Q21's lateness (receipt > commit) becomes ship-after-order, as in Q4. The
join/agg/subquery STRUCTURE of each query — the thing that exercises the
planner — is preserved exactly.

Scale notes (100 TB) per docstring; shared principles: selective filters sit
on base columns so they push into parquet scans, constant-size dims broadcast
explicitly, lineitem↔orders is the only big shuffle, aggregates are
partial-before-shuffle, and every top-k orders by a deterministic total key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .util import dround, gated_broadcast


def _trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (l_partkey, l_suppkey) — the partsupp surrogate: which
    supplier supplies which part, derived from actual trade. One
    hash-distinct shuffle on the pair; at 100 TB this is the same shuffle
    partsupp's own build would cost, and it feeds every Q2/Q16-family join
    as an equi-keyed, already-deduplicated bridge."""
    return (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM part, ps, supplier, nation, region
WHERE p_partkey = ps.pk AND s_suppkey = ps.sk
  AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND s_acctbal = (SELECT min(s2.s_acctbal)
                   FROM ps ps2, supplier s2, nation n2, region r2
                   WHERE ps2.pk = p_partkey AND s2.s_suppkey = ps2.sk
                     AND s2.s_nationkey = n2.n_nationkey
                     AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European supplier with
    the minimum account balance (the correlated-min subquery pattern; cost
    → acctbal under the trimmed schema).

    Scale: the correlated min plans as ONE window-min over the already-
    joined relation partitioned by part key — no second scan of the bridge,
    no per-part subquery execution (the literal decorrelation Catalyst
    would do for the SQL form). part's size/type filter pushes into its
    scan; nation and region broadcast; the bridge join is the only big
    shuffle. The min compares STORED doubles (no arithmetic), so the
    equality is exact on both engines."""
    ps = _trade_pairs(spark, sf_dir)
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        ps.join(supp, ps.sk == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    joined = eu.join(part, eu.pk == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by potential revenue for one
    market segment.

    Scale: both date filters push into their scans; the segment filter
    makes customer the small side (semi-join shape via inner join on the
    filtered dim); lineitem↔orders shuffles once on the order key; the
    per-order aggregate folds map-side; top-10 on the rounded revenue with
    the unique order key as tiebreak plans as TakeOrderedAndProject — no
    global sort materializes."""
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q8_market_share",
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue sold into Europe,
    by year — the double-nation-role join (customer's nation restricts the
    market, supplier's nation is the share dimension).

    Scale: nation (twice, different roles) and region broadcast; the part
    type filter pushes into part's scan and makes it broadcastable too;
    lineitem↔orders is the one big shuffle; the 2-group aggregate with its
    conditional numerator folds map-side. The share divides two same-group
    sums, rounded identically on both engines."""
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_reg") == reg.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            dround(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount)
           - p_retailprice * l_quantity * 0.1 AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on a part family by supplier nation and year
    (supply cost → 10% of retail price under the trimmed schema).

    Scale: the name filter pushes into part's scan (a contains-substring
    the parquet reader evaluates per page) and shrinks it to broadcast
    size; supplier and nation broadcast; lineitem↔orders is the single big
    shuffle; the small (nation × year) aggregate folds map-side."""
    part = table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nat = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dround(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    oracle="""
SELECT l_partkey AS ps_partkey,
       round(sum(l_extendedprice * l_quantity), 2) AS value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
GROUP BY l_partkey
HAVING round(sum(l_extendedprice * l_quantity), 2)
     > round((SELECT sum(l_extendedprice * l_quantity) * 0.001
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_5'), 2)
ORDER BY value DESC, ps_partkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts representing a significant share of one nation's
    traded value — the group-by with a scalar-subquery threshold (stock
    value → traded value under the trimmed schema).

    Scale: the per-part aggregate and the grand total come from the SAME
    filtered join — computed here as one aggregation plus a 1-row global
    sum joined back as a broadcast (a crossJoin of a 1-row frame), never a
    second scan per group. Both sides of the threshold comparison are
    rounded to the same fixed scale (the q15/q22 pattern), so a sum within
    an ULP of the cutoff cannot flip membership across engines."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    traded = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
    )
    per_part = traded.groupBy("l_partkey").agg(F.sum("v").alias("raw_value"))
    total = traded.agg(
        dround(F.sum("v") * F.lit(0.001), 2).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(dround(F.col("raw_value"), 2) > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            dround(F.col("raw_value"), 2).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "q16_parts_supplier_count",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT sk) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) ps
JOIN part ON p_partkey = pk
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many suppliers can supply each qualifying part class,
    excluding flagged suppliers (complaints → negative balance under the
    trimmed schema) — the NOT IN + count-distinct combination.

    Scale: the NOT IN over a non-nullable key plans as a broadcast
    anti-join against the (tiny) flagged-supplier list — never the
    null-aware nested loop the general NOT IN needs; part's three filters
    push into its scan; count(DISTINCT) over the pre-deduplicated bridge
    is a two-phase partial-distinct aggregate."""
    ps = _trade_pairs(spark, sf_dir)
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    flagged = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(gated_broadcast(flagged), ps.sk == flagged.s_suppkey, "left_anti")
        .join(gated_broadcast(part), F.col("pk") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sk").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_potential_promotion",
    oracle="""
SELECT s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_4'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 50)
ORDER BY s_name
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one nation who moved real volume of a part
    family in one year (availqty threshold → shipped-quantity threshold
    under the trimmed schema) — the IN-over-grouped-subquery pattern.

    Scale: the inner aggregate runs once over the year+name-filtered join
    (both filters pushed down, part broadcast) and its qualifying supplier
    keys — a handful of rows — broadcast into a left-semi join against the
    nation-filtered supplier dim; nothing re-executes per outer row."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    movers = (
        li.join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(movers), supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", dround("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


@register(
    "q21_suppliers_who_kept_waiting",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders     ON o_orderkey = l1.l_orderkey
JOIN nation     ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_6'
  AND l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers in one nation who were the SOLE late shipper on
    a multi-supplier finished order (lateness → ship-after-order under the
    trimmed schema) — the EXISTS + correlated NOT EXISTS double.

    Scale: both subqueries plan as one left-semi and one left-anti join
    against the same lineitem scan, each equi-keyed on the order key with
    the inequality conditions riding the join — no per-row subquery
    execution; the status/nation filters push into their scans; the spine
    shuffles on the order key that all three lineitem roles share, so AQE
    can reuse the exchange."""
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_6")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    l1 = li.select(
        F.col("l_orderkey").alias("l1_ok"),
        F.col("l_suppkey").alias("l1_sk"),
        F.col("l_shipdate").alias("l1_ship"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_ok"),
        F.col("l_suppkey").alias("l3_sk"),
        F.col("l_shipdate").alias("l3_ship"),
    )
    base = (
        l1.join(orders, F.col("l1_ok") == orders.o_orderkey)
        .join(supp, F.col("l1_sk") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .filter(F.col("l1_ship") > F.col("o_orderdate"))
    )
    with_other = base.join(
        l2,
        (F.col("l2_ok") == F.col("l1_ok")) & (F.col("l2_sk") != F.col("l1_sk")),
        "left_semi",
    )
    sole_late = with_other.join(
        l3,
        (F.col("l3_ok") == F.col("l1_ok"))
        & (F.col("l3_sk") != F.col("l1_sk"))
        & (F.col("l3_ship") > F.col("o_orderdate")),
        "left_anti",
    )
    return (
        sole_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )

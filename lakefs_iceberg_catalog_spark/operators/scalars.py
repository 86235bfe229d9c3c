"""Ring A — scalar expression families (string / datetime / math /
conditional / array / json) + the Python UDF slow path.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd). The two UDF entries exist to cover the reference's
UDF surface (SURVEY.md §2.2 `udf_python`/`udaf_pandas`) and deliberately
compute something the oracle can also express, so the comparison validates
the Arrow serialization path itself.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..tables import table
from .util import dround


@register(
    "scalar_string",
    oracle="""
SELECT p_partkey,
       upper(p_brand)                          AS brand_u,
       lower(p_type)                           AS type_l,
       substr(p_name, 1, 8)                    AS name8,
       trim(p_name)                            AS name_t,
       length(p_name)                          AS name_len,
       split_part(p_type, ' ', 1)              AS type_head,
       regexp_extract(p_brand, '[0-9]+', 0)    AS brand_num,
       replace(p_brand, '#', '-')              AS brand_dash,
       p_brand || ':' || p_type                AS brand_type
FROM part
WHERE p_size <= 20
""",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substr, trim, length, split_part, regex extract,
    replace, concat."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_size") <= 20).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.trim("p_name").alias("name_t"),
        F.length("p_name").alias("name_len"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "scalar_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)      AS yr,
       CAST(month(o_orderdate) AS INT)     AS mth,
       CAST(day(o_orderdate) AS INT)       AS dom,
       date_trunc('month', o_orderdate)    AS month_start,
       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
       CAST(epoch(o_orderdate) AS BIGINT)  AS epoch_s,
       strftime(o_orderdate, '%Y-%m-%d')   AS iso_day
FROM orders
WHERE o_orderkey % 10 = 0
""",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: extract year/month/day, date_trunc, interval
    arithmetic, epoch seconds, formatting."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAY")).cast("timestamp").alias("due_ts"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       round(abs(l_extendedprice - 30000), 2)       AS dev,
       CAST(ceil(l_quantity) AS BIGINT)             AS qty_ceil,
       CAST(floor(l_discount * 100) AS BIGINT)      AS disc_pct,
       round(pow(l_quantity, 2), 2)                 AS qty_sq,
       round(sqrt(l_extendedprice), 4)              AS price_sqrt,
       round(ln(l_extendedprice + 1), 6)            AS price_ln,
       l_orderkey % 7                               AS key_mod
FROM lineitem
WHERE l_linenumber <= 2
""",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/ceil/floor/pow/sqrt/ln/modulo with ANSI null
    semantics (+1 guards ln(0))."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        dround(F.abs(F.col("l_extendedprice") - 30000), 2).alias("dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        dround(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        dround(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        dround(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 100000 THEN 'large'
            WHEN o_totalprice >= 10000  THEN 'medium'
            ELSE 'small' END                          AS size_tier,
       coalesce(nullif(o_orderstatus, 'O'), 'open')   AS status_label,
       CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS is_rush
FROM orders
""",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiers, coalesce/nullif, boolean-to-flag projection."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 100000, "large")
        .when(F.col("o_totalprice") >= 10000, "medium")
        .otherwise("small")
        .alias("size_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_label"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("is_rush"),
    )


@register(
    "scalar_array_map",
    oracle="""
SELECT vec_id,
       label,
       len(embedding)                                   AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6)           AS first_dim,
       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq_norm,
       len(list_filter(embedding, x -> x > 0))          AS n_positive
FROM embeddings
""",
)
def scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambda family over the embedding column: size, element access,
    fold (aggregate) for the squared norm, filter.

    All four run as JVM higher-order functions on the array — no Python, no
    explode (an explode would multiply 100 TB of rows by 64).
    """
    e = table(spark, sf_dir, "embeddings")
    dbl = lambda x: x.cast("double")  # noqa: E731 — accumulate in float64 in both engines
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        dround(F.element_at("embedding", 1).cast("double"), 6).alias("first_dim"),
        dround(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x)), 6
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "scalar_json",
    oracle="""
SELECT event_type,
       count(*)                                                  AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))    AS max_k
FROM events
GROUP BY event_type
""",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the `events.props` string column + aggregate.

    `get_json_object` evaluates JVM-side; at 100 TB prefer parsing once with
    `from_json` into a struct column and persisting the struct (schema-on-write)
    rather than re-parsing per query.
    """
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "udf_python",
    oracle="""
SELECT doc_id,
       lower(trim(substr(text, 1, 40))) AS norm_prefix,
       n_chars
FROM documents
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (deliberately trivial — the API surface being
    exercised is pickle-per-row serde). The docstring is the warning: this is
    the slow path; every other operator in this package stays JVM-side."""
    d = table(spark, sf_dir, "documents")

    @F.udf(T.StringType())
    def norm_prefix(s: str) -> str:
        return s[:40].strip().lower() if s is not None else None

    return d.select("doc_id", norm_prefix("text").alias("norm_prefix"), "n_chars")


@register(
    "udaf_pandas",
    oracle="""
SELECT event_type,
       round(avg(value), 4)              AS mean_value,
       round(max(value) - min(value), 4) AS value_range
FROM events
GROUP BY event_type
""",
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDAF (Arrow batches): per-group mean and range.

    Scale: Arrow transfer is columnar and batched; the groupBy shuffle is the
    same as a built-in agg. Used only when the aggregate genuinely has no
    built-in form — here it does (the oracle is avg/max/min) so the entry
    validates the Arrow path against the JVM result.
    """
    e = table(spark, sf_dir, "events")

    @F.pandas_udf("double")
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    @F.pandas_udf("double")
    def range_udaf(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (
        e.groupBy("event_type")
        .agg(
            dround(mean_udaf("value"), 4).alias("mean_value"),
            dround(range_udaf("value"), 4).alias("value_range"),
        )
    )


@register(
    "scalar_bitwise",
    oracle="""
SELECT l_orderkey,
       l_partkey,
       l_orderkey & l_partkey  AS b_and,
       l_orderkey | l_partkey  AS b_or,
       xor(l_orderkey, l_partkey) AS b_xor,
       l_orderkey << 2         AS b_shl,
       l_orderkey >> 1         AS b_shr
FROM lineitem
WHERE l_linenumber = 1 AND l_orderkey < 10000
""",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts on integer keys."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 10000))
        .select(
            "l_orderkey",
            "l_partkey",
            F.col("l_orderkey").bitwiseAND(F.col("l_partkey")).alias("b_and"),
            F.col("l_orderkey").bitwiseOR(F.col("l_partkey")).alias("b_or"),
            F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("b_xor"),
            F.shiftleft(F.col("l_orderkey"), 2).alias("b_shl"),
            F.shiftright(F.col("l_orderkey"), 1).alias("b_shr"),
        )
    )


@register(
    "scalar_null_safe",
    oracle="""
WITH d AS (
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS status_n
    FROM orders
)
SELECT o_orderkey,
       status_n,
       status_n IS NOT DISTINCT FROM 'F'   AS eq_f_nullsafe,
       status_n IS DISTINCT FROM 'O'       AS ne_o_nullsafe,
       status_n IS NULL                    AS is_n
FROM d
""",
)
def scalar_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe comparison semantics (<=> / IS [NOT] DISTINCT FROM) over a
    derived nullable column — three-valued logic made two-valued."""
    o = table(spark, sf_dir, "orders")
    d = o.select("o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_n"))
    return d.select(
        "o_orderkey",
        "status_n",
        F.col("status_n").eqNullSafe(F.lit("F")).alias("eq_f_nullsafe"),
        (~F.col("status_n").eqNullSafe(F.lit("O"))).alias("ne_o_nullsafe"),
        F.col("status_n").isNull().alias("is_n"),
    )


@register(
    "scalar_hash",
    oracle="""
SELECT doc_id,
       md5(text)    AS h_md5,
       sha256(text) AS h_sha256,
       md5(text || ':' || CAST(doc_id AS VARCHAR)) AS h_salted
FROM documents
WHERE doc_id < 100
""",
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest family (content addressing / dedup keys):
    md5, sha256, salted md5 — hex output identical across engines."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5(F.encode("text", "UTF-8")).alias("h_md5"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("h_sha256"),
        F.md5(
            F.encode(F.concat_ws(":", "text", F.col("doc_id").cast("string")), "UTF-8")
        ).alias("h_salted"),
    )


@register(
    "scalar_regex",
    oracle=r"""
SELECT doc_id,
       source,
       CAST(regexp_extract(source, '([a-z]+)(\d+)', 2) AS INT)   AS src_num,
       regexp_extract(source, '([a-z]+)(\d+)', 1)                AS src_family,
       regexp_replace(text, '\d+', '#', 'g')                     AS masked,
       regexp_matches(text, '\d')                                AS has_digit
FROM documents
WHERE doc_id < 200
""",
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: group extraction (regexp_extract), global
    substitution (regexp_replace), and containment (rlike) — the text-
    wrangling primitives every ingestion pipeline leans on. Patterns stay
    in the POSIX-compatible subset where Java regex (Spark) and RE2
    (DuckDB) agree, which is also the subset that stays portable at
    deployment. Pure scan-stage codegen expressions — no shuffle, no
    Python."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        "source",
        F.regexp_extract("source", r"([a-z]+)(\d+)", 2).cast("int").alias("src_num"),
        F.regexp_extract("source", r"([a-z]+)(\d+)", 1).alias("src_family"),
        F.regexp_replace("text", r"\d+", "#").alias("masked"),
        F.col("text").rlike(r"\d").alias("has_digit"),
    )


@register(
    "scalar_try_safe",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(CASE CAST(o_orderkey % 3 AS INTEGER)
                WHEN 0 THEN CAST(o_orderkey AS VARCHAR)
                WHEN 1 THEN 'n/a' ELSE '' END AS INTEGER) AS parsed,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE round(o_totalprice / CAST(o_orderkey % 5 AS DOUBLE), 6)
       END AS safe_ratio
FROM orders
""",
)
def scalar_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface (ANSI-mode's escape hatches): TRY_CAST
    turns unparseable strings into NULL instead of failing the job, and
    try_divide absorbs division by zero the same way — the difference
    between a 100 TB pipeline that quarantines a handful of bad records
    and one that dies at 99% on the first malformed row. A third of the
    synthetic inputs parse, a third are junk ('n/a'), a third empty; every
    fifth divisor is zero — all three failure shapes exercised.

    Pure scan-stage codegen (no shuffle, no Python); the DuckDB oracle
    uses its own TRY_CAST and a CASE-guarded division as the semantic
    spec."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "try_cast(CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN CAST(o_orderkey AS STRING) "
            "WHEN 1 THEN 'n/a' ELSE '' END AS INT)"
        ).alias("parsed"),
        dround(
            F.try_divide(F.col("o_totalprice"), (F.col("o_orderkey") % 5).cast("double")),
            6,
        ).alias("safe_ratio"),
    )

"""Relational coverage, part 2: outer joins, subquery forms, LATERAL,
regexp battery, cast-table battery.

Reference surfaces: full/right outer joins (logical_join.rs:14-33),
subquery kinds Scalar/Exists/Any (expr/subquery_expr.rs:14-26) with
decorrelation (plan_subquery.rs:36-44), lateral-style table execute
(table_execute.rs:60), regexp scalar functions (string/regexp_*.rs), and
the cast rule tables (functions/cast/builtin).

Cast parity note: CAST(double AS int) truncates in Spark but rounds in
DuckDB — the battery therefore tests the explicit floor/trunc forms, and
round-trip string casts, which agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"


# ---------------------------------------------------------------------------
# FULL / RIGHT outer joins
# ---------------------------------------------------------------------------
@register_query(
    "rel_outer_joins",
    oracle="""
WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_acctbal > 9000),
recent AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
           WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
           GROUP BY o_custkey)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       c_acctbal, n_orders,
       (c_custkey IS NULL) AS only_right,
       (o_custkey IS NULL) AS only_left
FROM big_cust FULL OUTER JOIN recent ON c_custkey = o_custkey
ORDER BY custkey
""",
)
def rel_outer_joins(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders")
    big_cust = t["customer"].filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_acctbal"
    )
    recent = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        big_cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_acctbal",
            "n_orders",
            F.col("c_custkey").isNull().alias("only_right"),
            F.col("o_custkey").isNull().alias("only_left"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# subquery forms: scalar, EXISTS, IN, NOT IN (via SQL — Catalyst
# decorrelates, the reference's plan_subquery.rs path)
# ---------------------------------------------------------------------------
_SUBQ_SQL = """
SELECT s_suppkey, s_name,
       (SELECT COUNT(*) FROM lineitem WHERE l_suppkey = s_suppkey) AS n_items,
       EXISTS (SELECT 1 FROM lineitem
               WHERE l_suppkey = s_suppkey AND l_quantity >= 49) AS has_bulk,
       s_suppkey IN (SELECT l_suppkey FROM lineitem
                     WHERE l_discount > 0.09) AS high_disc,
       s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
                         WHERE l_returnflag = 'A') AS never_returned
FROM supplier
ORDER BY s_suppkey
"""


@register_query("rel_subqueries", oracle=_SUBQ_SQL)
def rel_subqueries(spark, sf_dir):
    t = load_tables(spark, sf_dir, "supplier", "lineitem")
    t["supplier"].createOrReplaceTempView("supplier")
    t["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(_SUBQ_SQL)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (reference table_execute.rs lateral-style)
# ---------------------------------------------------------------------------
_LATERAL_SQL = """
SELECT n_name, t.top_bal
FROM nation, LATERAL (
  SELECT MAX(c_acctbal) AS top_bal FROM customer
  WHERE c_nationkey = n_nationkey) t
WHERE t.top_bal IS NOT NULL
ORDER BY n_name
"""


@register_query("rel_lateral", oracle=_LATERAL_SQL)
def rel_lateral(spark, sf_dir):
    t = load_tables(spark, sf_dir, "nation", "customer")
    t["nation"].createOrReplaceTempView("nation")
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# regexp battery (string/regexp_{count,instr,like,replace}.rs)
# ---------------------------------------------------------------------------
@register_query(
    "fn_regexp_battery",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS vowel_runs,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(text, '^[a-z]') AS starts_alpha,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
       CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_spaces
FROM documents WHERE doc_id < 200
ORDER BY doc_id
""",
)
def fn_regexp_battery(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 200
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[aeiou]+")).cast("long").alias("vowel_runs"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.regexp_like(F.col("text"), F.lit("^[a-z]")).alias("starts_alpha"),
        F.regexp_extract("text", "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_count(F.col("text"), F.lit(" ")).cast("long").alias("n_spaces"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# cast-table battery (functions/cast/builtin parity; cross-engine-safe forms)
# ---------------------------------------------------------------------------
@register_query(
    "fn_cast_battery",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(o_totalprice AS VARCHAR) AS price_str,
       CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) AS price_dec_str,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       CAST(o_orderdate AS VARCHAR) AS date_str,
       TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
       CAST(o_orderkey % 2 = 0 AS VARCHAR) AS bool_str,
       CAST(CAST(o_orderkey AS DOUBLE) AS VARCHAR) AS key_double_str
FROM orders WHERE o_orderkey < 300
ORDER BY o_orderkey
""",
)
def fn_cast_battery(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"].filter(
        F.col("o_orderkey") < 300
    )
    return ords.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("o_totalprice").cast("string").alias("price_str"),
        F.col("o_totalprice").cast(D).cast("string").alias("price_dec_str"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.ceil("o_totalprice").cast("long").alias("price_ceil"),
        F.col("o_orderdate").cast("string").alias("date_str"),
        F.col("o_orderpriority").try_cast("long").alias("bad_cast"),
        (F.col("o_orderkey") % 2 == 0).cast("string").alias("bool_str"),
        F.col("o_orderkey").cast("double").cast("string").alias("key_double_str"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# UNPIVOT / melt (wide → long; Spark `unpivot`, DuckDB UNPIVOT)
# ---------------------------------------------------------------------------
@register_query(
    "rel_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, name, value
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey < 100)
UNPIVOT (value FOR name IN (l_quantity, l_extendedprice, l_discount))
ORDER BY l_orderkey, l_linenumber, name
""",
)
def rel_unpivot(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"].filter(
        F.col("l_orderkey") < 100
    )
    return (
        li.select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "name",
            "value",
        )
        .orderBy("l_orderkey", "l_linenumber", "name")
    )


# ---------------------------------------------------------------------------
# LIMIT + OFFSET paging (PhysicalLimit offset semantics, limit.rs:19-32) —
# deterministic because the sort key chain is unique
# ---------------------------------------------------------------------------
@register_query(
    "rel_limit_offset",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 25 OFFSET 100
""",
)
def rel_limit_offset(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(100)
        .limit(25)
    )

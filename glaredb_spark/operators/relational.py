"""Relational operator coverage beyond the TPC-H suite.

Maps the reference's declared-but-stubbed surface (SURVEY.md §2.1: window
functions, GROUPING SETS, INTERSECT/EXCEPT, UNNEST — all `not_implemented!`
in GlareDB but part of its declared capability) onto Spark's built-ins,
plus the set ops / VALUES / distinct-aggregate paths GlareDB does implement
(plan_set_operation.rs:33-60, values.rs:21,
hash_aggregate/distinct_aggregates.rs:46-143).

Determinism: window frames always order by a unique key chain; windowed
sums go through DECIMAL; ratios are single divisions of exact values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"


# ---------------------------------------------------------------------------
# ranking window functions (reference: WindowExpr stub, expr/window_expr.rs)
# ---------------------------------------------------------------------------
@register_query(
    "rel_window_ranking",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       LAG(c_acctbal) OVER w AS prev_bal,
       LEAD(c_acctbal) OVER w AS next_bal
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_nationkey, rn
""",
)
def rel_window_ranking(spark, sf_dir):
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.lag("c_acctbal").over(w).alias("prev_bal"),
            F.lead("c_acctbal").over(w).alias("next_bal"),
        )
        .orderBy("c_nationkey", "rn")
    )


# ---------------------------------------------------------------------------
# running / moving aggregate windows
# ---------------------------------------------------------------------------
@register_query(
    "rel_window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(COUNT(*)
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS moving_avg_3
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
""",
)
def rel_window_running(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"].filter(
        F.col("o_custkey") < 100
    )
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = base.rowsBetween(Window.unboundedPreceding, 0)
    w_mov = base.rowsBetween(-2, 0)
    price = F.col("o_totalprice").cast(D)
    return (
        ords.select(
            "o_custkey",
            "o_orderkey",
            F.sum(price).over(w_run).cast("double").alias("running_total"),
            (
                F.sum(price).over(w_mov).cast("double")
                / F.count(F.lit(1)).over(w_mov).cast("double")
            ).alias("moving_avg_3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# window frame battery — explicit ROWS / RANGE frames + distribution and
# value functions (ntile, percent_rank, cume_dist, first/last/nth_value).
# Frames are explicit everywhere (last_value under the default frame is the
# current row — a classic cross-engine footgun); order keys are unique
# (o_orderkey tiebreaker) so results are engine-independent; percent_rank /
# cume_dist are single divisions of exact integers (bit-identical doubles).
# ---------------------------------------------------------------------------
@register_query(
    "rel_window_frames",
    oracle="""
SELECT o_orderpriority, o_orderkey,
       CAST(NTILE(4) OVER wo AS BIGINT) AS quartile,
       PERCENT_RANK() OVER wo AS pr,
       CUME_DIST() OVER wo AS cd,
       FIRST_VALUE(o_orderkey) OVER wf AS first_key,
       LAST_VALUE(o_orderkey) OVER wf AS last_key,
       NTH_VALUE(o_orderkey, 2) OVER wf AS second_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER wr AS DOUBLE)
         AS range_sum,
       CAST(COUNT(*) OVER wr AS BIGINT) AS range_n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
              OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
         AS centered_sum
FROM orders
WHERE o_orderkey < 2000
WINDOW wo AS (PARTITION BY o_orderpriority ORDER BY o_orderkey),
       wf AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       wr AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
              RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
ORDER BY o_orderpriority, o_orderkey
""",
)
def rel_window_frames(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"].filter(
        F.col("o_orderkey") < 2000
    )
    wo = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wr = wo.rangeBetween(-100, 0)
    wc = wo.rowsBetween(-1, 1)
    price = F.col("o_totalprice").cast(D)
    return (
        ords.select(
            "o_orderpriority",
            "o_orderkey",
            F.ntile(4).over(wo).cast("long").alias("quartile"),
            F.percent_rank().over(wo).alias("pr"),
            F.cume_dist().over(wo).alias("cd"),
            F.first("o_orderkey").over(wf).alias("first_key"),
            F.last("o_orderkey").over(wf).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
            F.sum(price).over(wr).cast("double").alias("range_sum"),
            F.count(F.lit(1)).over(wr).cast("long").alias("range_n"),
            F.sum(price).over(wc).cast("double").alias("centered_sum"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# ROLLUP / CUBE / GROUPING SETS + grouping() (reference: ROLLUP/CUBE are
# expanded at bind_group_by.rs:164-186; explicit GROUPING SETS stubbed)
# ---------------------------------------------------------------------------
@register_query(
    "rel_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
""",
)
def rel_rollup(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        ords.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("total"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


@register_query(
    "rel_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
""",
)
def rel_cube(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(D)).cast("double").alias("sum_qty"),
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@register_query(
    "rel_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority, n
""",
)
def rel_grouping_sets(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"]
    ords.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority, n
        """
    )


# ---------------------------------------------------------------------------
# set operations — INTERSECT / EXCEPT are stubbed in the reference
# (plan_set_operation.rs:30); UNION [ALL/DISTINCT] is implemented
# ---------------------------------------------------------------------------
@register_query(
    "rel_setops",
    oracle="""
WITH c96 AS (SELECT DISTINCT o_custkey AS k FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
c97 AS (SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
SELECT 'both' AS op, k FROM (SELECT k FROM c96 INTERSECT SELECT k FROM c97)
UNION ALL
SELECT 'only96' AS op, k FROM (SELECT k FROM c96 EXCEPT SELECT k FROM c97)
UNION ALL
SELECT 'either' AS op, k FROM (SELECT k FROM c96 UNION SELECT k FROM c97)
ORDER BY op, k
""",
)
def rel_setops(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"]

    def custs(y0, y1):
        return (
            ords.filter(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp_ntz"))
            )
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )

    c96, c97 = custs(1996, 1997), custs(1997, 1998)
    both = c96.intersect(c97).select(F.lit("both").alias("op"), "k")
    only96 = c96.exceptAll(c97).distinct().select(F.lit("only96").alias("op"), "k")
    either = c96.union(c97).distinct().select(F.lit("either").alias("op"), "k")
    return both.unionAll(only96).unionAll(either).orderBy("op", "k")


# ---------------------------------------------------------------------------
# VALUES + DISTINCT (reference: values.rs:21, UNION-distinct rewrite)
# ---------------------------------------------------------------------------
@register_query(
    "rel_values_distinct",
    oracle="""
SELECT a, b FROM (VALUES (1, 'x'), (2, 'y'), (1, 'x'), (3, 'z'),
                         (NULL, 'n'), (NULL, 'n')) AS v(a, b)
GROUP BY a, b
ORDER BY a NULLS LAST, b
""",
)
def rel_values_distinct(spark, sf_dir):
    rows = [(1, "x"), (2, "y"), (1, "x"), (3, "z"), (None, "n"), (None, "n")]
    df = spark.createDataFrame(rows, "a int, b string")
    return df.distinct().orderBy(F.col("a").asc_nulls_last(), "b")


# ---------------------------------------------------------------------------
# SingleRow / NoRows sources (reference execution/operators/single_row.rs:18,
# no_rows.rs:12 — SELECT without FROM, and a provably-empty relation).
# UNION ALL of a FROM-less scalar row, an empty branch (WHERE false over a
# real scan), and an ungrouped aggregate over the empty branch (COUNT over
# zero rows must still yield its single row).
# ---------------------------------------------------------------------------
@register_query(
    "rel_scalar_rows",
    oracle="""
SELECT 'single_row' AS tag, CAST(1 + 2 AS BIGINT) AS v
UNION ALL
SELECT 'no_rows' AS tag, CAST(o_orderkey AS BIGINT) AS v
FROM orders WHERE false
UNION ALL
SELECT 'agg_over_empty' AS tag, CAST(COUNT(*) AS BIGINT) AS v
FROM orders WHERE false
ORDER BY tag
""",
)
def rel_scalar_rows(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"]
    single = spark.range(1).select(
        F.lit("single_row").alias("tag"), (F.lit(1) + F.lit(2)).cast("long").alias("v")
    )
    empty = ords.filter(F.lit(False)).select(
        F.lit("no_rows").alias("tag"), F.col("o_orderkey").cast("long").alias("v")
    )
    agg_empty = (
        ords.filter(F.lit(False))
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("agg_over_empty").alias("tag"), F.col("v").cast("long"))
    )
    return single.unionAll(empty).unionAll(agg_empty).orderBy("tag")


# ---------------------------------------------------------------------------
# UNNEST / LATERAL (reference stubs UNNEST — plan_unnest.rs:13)
# ---------------------------------------------------------------------------
@register_query(
    "rel_unnest_lateral",
    oracle="""
SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, embedding[i] AS val
FROM embeddings, UNNEST(range(1, 5)) AS r(i)
WHERE vec_id < 50
ORDER BY vec_id, pos
""",
)
def rel_unnest_lateral(spark, sf_dir):
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return (
        emb.filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "val"))
        .select("vec_id", F.col("pos").cast("long").alias("pos"), "val")
        .orderBy("vec_id", "pos")
    )


# ---------------------------------------------------------------------------
# top-k per group (window filter — Spark's TakeOrdered per partition)
# ---------------------------------------------------------------------------
@register_query(
    "rel_topk_per_group",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
WHERE rn <= 3
ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
""",
)
def rel_topk_per_group(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        ords.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", F.col("o_totalprice").desc(), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# NULL semantics: NULLIF / COALESCE / IS [NOT] DISTINCT FROM
# (reference: is.rs, comparison.rs IS DISTINCT FROM, expr_binder COALESCE)
# ---------------------------------------------------------------------------
@register_query(
    "rel_null_semantics",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nullified,
       CAST(SUM(CASE WHEN COALESCE(NULLIF(o_orderstatus, 'P'), 'fallback')
                          = 'fallback' THEN 1 ELSE 0 END) AS BIGINT) AS n_fallback,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P')
                          IS DISTINCT FROM NULLIF(o_orderstatus, 'F')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct_from
FROM orders
""",
)
def rel_null_semantics(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"]
    a = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    b = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return ords.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(a.isNull(), 1).otherwise(0)).alias("n_nullified"),
        F.sum(
            F.when(F.coalesce(a, F.lit("fallback")) == "fallback", 1).otherwise(0)
        ).alias("n_fallback"),
        F.sum(F.when(~a.eqNullSafe(b), 1).otherwise(0)).alias("n_distinct_from"),
    )


# ---------------------------------------------------------------------------
# DISTINCT aggregates, grouped + ungrouped (reference:
# distinct_aggregates.rs:46-143, slt/standard/aggregates/distinct_*.slt)
# ---------------------------------------------------------------------------
@register_query(
    "rel_distinct_aggs",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS nd_parts,
       COUNT(DISTINCT l_suppkey) AS nd_supps,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)
         AS sum_distinct_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def rel_distinct_aggs(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.countDistinct("l_suppkey").alias("nd_supps"),
            F.sum_distinct(F.col("l_quantity").cast(D)).cast("double").alias(
                "sum_distinct_qty"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )

"""TPC-H q01–q22 adapted to the driver fixture schema, DataFrame-first.

The reference runs TPC-H via golden SLTs (slt/tpchbench/q01.slt..q22.slt)
and bench files (bench/tpch/{1,10,50,100}/q*.bench). The driver fixture is a
reduced TPC-H star schema (no partsupp; fewer columns; money columns stored
as DOUBLE; l_shipdate is a timestamp) — every query below keeps the
*operator shape* of its TPC-H namesake (same join pattern, agg structure,
subquery form) on the available columns.

Determinism contract: money aggregates are computed in exact DECIMAL
arithmetic (cast each input to DECIMAL(15,2), keep every intermediate within
DECIMAL(38,_) with explicit casts) and only the final aggregate is cast to
DOUBLE. Both the Spark builders and the DuckDB oracle SQL do the identical
casts, so results are bit-identical across engines — no float-summation
order sensitivity. This mirrors the reference, whose TPC-H columns really
are Decimal64(15,2) (glaredb_ext_tpch_gen/src/functions/lineitem.rs:41-62).

Scale notes (100 TB):
- lineitem/orders joins shuffle on the join key; AQE picks shuffled-hash vs
  sort-merge and splits skewed partitions at runtime.
- region/nation (≤25 rows by schema) and other sub-broadcast-threshold dims
  are broadcast explicitly — no shuffle of the fact table for those joins.
- Aggregations are partial (map-side combine) by construction via groupBy.
- Filters sit directly on scan columns → parquet predicate pushdown +
  row-group pruning (reference analog: row_group_pruner.rs:13-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"


def dec(col: str):
    return F.col(col).cast(D)


ONE = F.lit(1).cast(D)

# exact: (15,2)*(16,2) product has scale 4, magnitude < 1e14
def disc_price():
    return (dec("l_extendedprice") * (ONE - dec("l_discount"))).cast("decimal(18,4)")


def charge():
    return (disc_price() * (ONE + dec("l_tax")).cast("decimal(16,2)")).cast(
        "decimal(24,6)"
    )


# Oracle-side equivalents (identical casts → identical exact values).
O_DEC = "CAST({c} AS DECIMAL(15,2))"
O_DISC = (
    "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * "
    "(CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2))) "
    "AS DECIMAL(18,4))"
)
O_CHARGE = (
    f"CAST({O_DISC} * CAST(CAST(1 AS DECIMAL(15,2)) + CAST(l_tax AS DECIMAL(15,2)) "
    "AS DECIMAL(16,2)) AS DECIMAL(24,6))"
)


def money(sum_col):
    """Final cast of an exact decimal aggregate to DOUBLE."""
    return sum_col.cast("double")


# ---------------------------------------------------------------------------
# q01 — pricing summary report (scan → filter → hash agg → sort)
# Reference plan shape: PhysicalScan → PhysicalFilter → PhysicalHashAggregate
# → PhysicalGlobalSort (SURVEY.md §2.1).
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q01",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({O_DISC}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({O_CHARGE}) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum(dec("l_quantity"))).alias("sum_qty"),
            money(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            money(F.sum(disc_price())).alias("sum_disc_price"),
            money(F.sum(charge())).alias("sum_charge"),
            (money(F.sum(dec("l_quantity"))) / F.count(F.lit(1))).alias("avg_qty"),
            (money(F.sum(dec("l_extendedprice"))) / F.count(F.lit(1))).alias("avg_price"),
            (money(F.sum(dec("l_discount"))) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q06 — forecast revenue change (pure scan-filter-aggregate; every predicate
# pushes to the parquet scan)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q06",
    oracle=f"""
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) *
                    CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(18,4))) AS DOUBLE)
       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money(
            F.sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,4)"))
        ).alias("revenue")
    )

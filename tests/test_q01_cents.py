"""Proof obligations for the r15 long-cents rewrite of tpch_q01.

The rewrite replaces the per-row double->decimal casts + widening decimal
product chain with exact integer "cents" arithmetic in codegen
(glaredb_spark/tpch.py::cents), aggregated in decimal accumulators so sums
stay exact at any scale. Three obligations, each a test below:

1. Per-row quantization equivalence — floor(x*100 + 0.5) equals the
   unscaled value of CAST(x AS DECIMAL(15,2)) on EVERY lineitem money
   column of every local fixture (the rewrite's precondition), and the
   inputs satisfy the preconditions (no nulls, no negatives).
2. Bit-identical results — the registered (cents) q01 collects exactly
   the rows of the previous decimal-chain plan, reconstructed here from
   the same helpers it used (dec/money/disc_price/charge).
3. Oracle parity — the driver's own DuckDB gate, at both local SFs.
"""

import os

import pytest
from pyspark.sql import functions as F

from glaredb_spark.registry import QUERIES, load_all
from glaredb_spark.tpch import T, cents, charge, dec, disc_price, money, ts
from tests.oracle import assert_parity

load_all()

MONEY_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _fixture_dirs(sf_dir, oracle_sf_dir):
    dirs = [sf_dir, oracle_sf_dir]
    big = "/root/testdata/sf0.1"
    if os.path.isdir(big):
        dirs.append(big)
    return dirs


def _q01_decimal_chain(spark, d):
    """The pre-r15 q01 plan, verbatim (decimal casts + widening products)."""
    li = T(spark, d, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum(dec("l_quantity"))).alias("sum_qty"),
            money(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            money(F.sum(disc_price())).alias("sum_disc_price"),
            money(F.sum(charge())).alias("sum_charge"),
            (money(F.sum(dec("l_quantity"))) / F.count(F.lit(1))).alias("avg_qty"),
            (money(F.sum(dec("l_extendedprice"))) / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (money(F.sum(dec("l_discount"))) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def test_cents_rowwise_equals_decimal_cast(spark, sf_dir, oracle_sf_dir):
    """floor(x*100+0.5) == unscaled(CAST(x AS DECIMAL(15,2))) per row,
    and the preconditions (non-null, non-negative) hold on the fixtures."""
    for d in _fixture_dirs(sf_dir, oracle_sf_dir):
        li = T(spark, d, "lineitem")["lineitem"]
        checks = []
        for c in MONEY_COLS:
            exact = (dec(c) * F.lit(100)).cast("long")  # integer-valued: exact
            checks.append(F.sum((cents(c) != exact).cast("int")).alias(f"neq_{c}"))
            checks.append(F.sum(F.col(c).isNull().cast("int")).alias(f"null_{c}"))
            checks.append(F.sum((F.col(c) < 0).cast("int")).alias(f"neg_{c}"))
        row = li.agg(*checks).collect()[0].asDict()
        bad = {k: v for k, v in row.items() if v != 0}
        assert not bad, f"{d}: cents precondition violated: {bad}"


def test_q01_bit_identical_to_decimal_chain(spark, sf_dir, oracle_sf_dir):
    for d in _fixture_dirs(sf_dir, oracle_sf_dir):
        new_rows = QUERIES["tpch_q01"](spark, d).collect()
        old_rows = _q01_decimal_chain(spark, d).collect()
        assert new_rows == old_rows, f"{d}: cents q01 != decimal-chain q01"


@pytest.mark.parametrize("which", ["small", "oracle"])
def test_q01_oracle_parity(spark, sf_dir, oracle_sf_dir, which):
    assert_parity(spark, "tpch_q01", sf_dir if which == "small" else oracle_sf_dir)


def _q18_decimal_chain(spark, d):
    """The pre-cents q18 plan (decimal sum + decimal HAVING compare)."""
    from glaredb_spark.tpch import D

    t = T(spark, d, "customer", "orders", "lineitem")
    big_orders = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("tot_qty"))
        .filter(F.col("tot_qty") > F.lit(150).cast(D))
    )
    return (
        big_orders
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            money(F.col("tot_qty")).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def test_q18_bit_identical_to_decimal_chain(spark, sf_dir, oracle_sf_dir):
    for d in _fixture_dirs(sf_dir, oracle_sf_dir):
        new_rows = QUERIES["tpch_q18"](spark, d).collect()
        old_rows = _q18_decimal_chain(spark, d).collect()
        assert new_rows == old_rows, f"{d}: cents q18 != decimal-chain q18"


@pytest.mark.parametrize("which", ["small", "oracle"])
def test_q18_oracle_parity(spark, sf_dir, oracle_sf_dir, which):
    assert_parity(spark, "tpch_q18", sf_dir if which == "small" else oracle_sf_dir)


def _q03_decimal_chain(spark, d):
    """The pre-cents q03 plan (sum of the decimal(18,4) disc_price)."""
    t = T(spark, d, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    ords = t["orders"].filter(F.col("o_orderdate") < ts("1997-03-15 00:00:00"))
    li = t["lineitem"].filter(F.col("l_shipdate") > ts("1997-03-15 00:00:00"))
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(disc_price())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q09_decimal_chain(spark, d):
    """The pre-cents q09 plan (per-row decimal disc_price amounts)."""
    t = T(spark, d, "part", "supplier", "lineitem", "orders", "nation")
    parts = t["part"].filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            disc_price().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(money(F.sum("amount")).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


def test_q03_bit_identical_to_decimal_chain(spark, sf_dir, oracle_sf_dir):
    for d in _fixture_dirs(sf_dir, oracle_sf_dir):
        new_rows = QUERIES["tpch_q03"](spark, d).collect()
        old_rows = _q03_decimal_chain(spark, d).collect()
        assert new_rows == old_rows, f"{d}: cents q03 != decimal-chain q03"


def test_q09_bit_identical_to_decimal_chain(spark, sf_dir, oracle_sf_dir):
    for d in _fixture_dirs(sf_dir, oracle_sf_dir):
        new_rows = QUERIES["tpch_q09"](spark, d).collect()
        old_rows = _q09_decimal_chain(spark, d).collect()
        assert new_rows == old_rows, f"{d}: cents q09 != decimal-chain q09"


@pytest.mark.parametrize("which", ["small", "oracle"])
@pytest.mark.parametrize("q", ["tpch_q03", "tpch_q09"])
def test_q03_q09_oracle_parity(spark, sf_dir, oracle_sf_dir, which, q):
    assert_parity(spark, q, sf_dir if which == "small" else oracle_sf_dir)


def test_events_value_cents_precondition(spark, sf_dir, oracle_sf_dir):
    """floor(value*100+0.5) == unscaled(CAST(value AS DECIMAL(15,2))) per
    row on the events fixture (precondition of the sessionize cents agg)."""
    from glaredb_spark.operators.events import _events

    for d in _fixture_dirs(sf_dir, oracle_sf_dir):
        ev = _events(spark, d)
        exact = (F.col("value").cast("decimal(15,2)") * F.lit(100)).cast("long")
        got = F.floor(F.col("value") * 100 + F.lit(0.5))
        row = ev.agg(
            F.sum((got != exact).cast("int")).alias("neq"),
            F.sum(F.col("value").isNull().cast("int")).alias("nulls"),
        ).collect()[0]
        assert row.neq == 0 and row.nulls == 0, f"{d}: events cents precondition"


def _sessionize_decimal_chain(spark, d):
    """The pre-cents sessionize plan (decimal sum for total_value)."""
    from pyspark.sql.window import Window

    from glaredb_spark.operators.events import _events

    ev = _events(spark, d)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wnum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 minutes")),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id", F.sum("new_session").over(wnum).cast("long")
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(15,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("user_id", "session_id")
    )


def test_sessionize_bit_identical_to_decimal_chain(spark, sf_dir, oracle_sf_dir):
    for d in _fixture_dirs(sf_dir, oracle_sf_dir):
        new_rows = QUERIES["events_sessionize"](spark, d).collect()
        old_rows = _sessionize_decimal_chain(spark, d).collect()
        assert new_rows == old_rows, f"{d}: cents sessionize != decimal chain"


@pytest.mark.parametrize("which", ["small", "oracle"])
def test_sessionize_oracle_parity(spark, sf_dir, oracle_sf_dir, which):
    assert_parity(
        spark, "events_sessionize", sf_dir if which == "small" else oracle_sf_dir
    )

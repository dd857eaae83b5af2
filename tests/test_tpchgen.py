"""Distributed TPC-H generator (sources/tpchgen.py ↔
glaredb_ext_tpch_gen): schema goldens run via slt (tpch_gen/describe.slt,
region.slt); here: spec invariants, determinism, and scale behavior."""

import pytest
from pyspark.sql import functions as F

from glaredb_spark.sources.tpchgen import gen_table

SF = 0.01


def test_constant_tables(spark):
    r = gen_table(spark, "region", SF).collect()
    assert [x.r_name for x in r] == [
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    ]
    n = gen_table(spark, "nation", SF).collect()
    assert len(n) == 25
    assert {x.n_regionkey for x in n} == {0, 1, 2, 3, 4}


def test_cardinalities_scale(spark):
    assert gen_table(spark, "customer", SF).count() == 1500
    assert gen_table(spark, "supplier", SF).count() == 100
    assert gen_table(spark, "part", SF).count() == 2000
    assert gen_table(spark, "partsupp", SF).count() == 8000
    assert gen_table(spark, "orders", SF).count() == 15000


def test_order_date_window(spark):
    o = gen_table(spark, "orders", SF).agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    ).collect()[0]
    assert str(o.lo) >= "1992-01-01" and str(o.hi) <= "1998-08-02"


def test_lineitem_date_constraints(spark):
    li = gen_table(spark, "lineitem", SF)
    bad = li.filter(
        (F.col("l_receiptdate") < F.col("l_shipdate"))
        | (F.col("l_shipdate") < "1992-01-02")
        | (F.col("l_receiptdate") > "1998-12-31")
    ).count()
    assert bad == 0
    per_order = li.groupBy("l_orderkey").count()
    mm = per_order.agg(F.min("count"), F.max("count")).collect()[0]
    assert mm[0] >= 1 and mm[1] <= 7


def test_partsupp_unique_and_in_range(spark):
    ps = gen_table(spark, "partsupp", SF)
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == ps.count()
    mm = ps.agg(F.min("ps_suppkey"), F.max("ps_suppkey")).collect()[0]
    assert mm[0] >= 1 and mm[1] <= 100


def test_sparse_orderkeys(spark):
    o = gen_table(spark, "orders", SF)
    # 8 keys per 32-block → max key ~4x order count
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    assert 15000 * 3 < mx <= 15000 * 4
    assert o.select("o_orderkey").distinct().count() == 15000


def test_status_consistent_with_lines(spark):
    """o_orderstatus must be derivable from the generated line dates —
    orders and lineitem share hash streams, no join needed."""
    o = gen_table(spark, "orders", SF).select("o_orderkey", "o_orderstatus")
    li = gen_table(spark, "lineitem", SF).select(
        "l_orderkey", (F.col("l_shipdate") <= F.lit("1995-06-17")).alias("sh")
    )
    derived = li.groupBy("l_orderkey").agg(
        F.when(F.every(F.col("sh")), "F")
        .when(~F.some(F.col("sh")), "O")
        .otherwise("P")
        .alias("st")
    )
    j = o.join(derived, o.o_orderkey == derived.l_orderkey)
    assert j.filter(F.col("o_orderstatus") != F.col("st")).count() == 0


def test_deterministic_across_partitionings(spark):
    a = gen_table(spark, "customer", 0.001).orderBy("c_custkey").collect()
    b = (
        gen_table(spark, "customer", 0.001)
        .repartition(7)
        .orderBy("c_custkey")
        .collect()
    )
    assert a == b


def test_unknown_table_errors(spark):
    with pytest.raises(ValueError, match="unknown tpch_gen table"):
        gen_table(spark, "nope", 1.0)

"""Function registry conformance — reference semantics spot checks
(1-indexed list_extract, strpos, isfinite, l2_distance, string_agg, SQL
surface registration)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_scalar_registry_basics(spark):
    from glaredb_spark.functions.scalar import fn

    df = spark.createDataFrame([Row(s="Hello World", x=-3.5, arr=[1.0, 2.0, 3.0])])
    row = df.select(
        fn["upper"](F.col("s")).alias("u"),
        fn["strpos"](F.col("s"), F.lit("World")).alias("p"),
        fn["abs"](F.col("x")).alias("a"),
        fn["list_extract"](F.col("arr"), F.lit(1)).alias("first"),  # 1-indexed
        fn["isfinite"](F.col("x")).alias("fin"),
        fn["left"](F.col("s"), 5).alias("l"),
        fn["right"](F.col("s"), 5).alias("r"),
        fn["cot"](F.lit(1.0)).alias("cot1"),
    ).collect()[0]
    assert row.u == "HELLO WORLD"
    assert row.p == 7
    assert row.a == 3.5
    assert row.first == 1.0  # reference list_extract.rs is 1-indexed
    assert row.fin is True
    assert row.l == "Hello"
    assert row.r == "World"
    assert abs(row.cot1 - 1 / math.tan(1.0)) < 1e-12


def test_isfinite_edge_cases(spark):
    from glaredb_spark.functions.scalar import fn

    df = spark.createDataFrame(
        [(1.0,), (float("inf",),), (float("-inf"),), (float("nan"),)], "x double"
    )
    got = [r[0] for r in df.select(fn["isfinite"](F.col("x"))).collect()]
    assert got == [True, False, False, False]


def test_l2_distance_known_value(spark):
    from glaredb_spark.functions.scalar import fn

    df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[3.0, 4.0])])
    assert df.select(fn["l2_distance"](F.col("a"), F.col("b"))).collect()[0][0] == 5.0


def test_sql_surface_registration(spark):
    from glaredb_spark.functions.register import register_all

    register_all(spark)
    assert spark.sql("SELECT l2_distance(array(0.0D,0.0D), array(3.0D,4.0D))").collect()[0][0] == 5.0
    assert spark.sql("SELECT strpos('hello', 'll')").collect()[0][0] == 3
    assert spark.sql("SELECT isfinite(double('inf'))").collect()[0][0] is False
    assert spark.sql("SELECT epoch(timestamp'1970-01-01 00:01:00')").collect()[0][0] == 60
    assert spark.sql("SELECT gcd(12, 18)").collect()[0][0] == 6
    assert spark.sql("SELECT lcm(4, 6)").collect()[0][0] == 12
    assert spark.sql("SELECT list_extract(array(1.0D, 2.0D), 1)").collect()[0][0] == 1.0


def test_string_agg_sorted(spark):
    from glaredb_spark.functions.aggregate import agg

    df = spark.createDataFrame([("b",), ("a",), ("c",)], "v string")
    assert df.agg(agg["string_agg"](F.col("v"), "|")).collect()[0][0] == "a|b|c"


def test_aggregate_registry_names(spark):
    from glaredb_spark.functions.aggregate import agg

    # every reference aggregate name is present (aggregate/builtin/mod.rs:21-44)
    for name in [
        "sum", "avg", "count", "min", "max", "first", "stddev_pop",
        "stddev_samp", "var_pop", "var_samp", "covar_pop", "covar_samp",
        "corr", "regr_count", "regr_avgx", "regr_avgy", "regr_r2",
        "regr_slope", "string_agg", "bool_and", "bool_or", "bit_and",
        "bit_or", "approx_count_distinct", "approx_quantile",
    ]:
        assert name in agg

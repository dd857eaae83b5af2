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
    # reference direction: unix seconds -> TIMESTAMP (datetime/epoch.rs,
    # slt epoch.slt: epoch(0) = 1970-01-01 00:00:00)
    assert str(spark.sql("SELECT epoch(60)").collect()[0][0]) == "1970-01-01 00:01:00"
    assert (
        str(spark.sql("SELECT epoch_ms(1500)").collect()[0][0])
        == "1970-01-01 00:00:01.500000"
    )
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


def test_sql_udf_matches_python_vector_kernels(spark):
    """ADVICE r1: the SQL UDF bodies must use the same scaled-integer kernels
    as glaredb_spark.functions.vector — bit-identical results."""
    from pyspark.sql import functions as F

    from glaredb_spark.functions import vector as V

    df = spark.createDataFrame(
        [([0.1, 0.2, 0.30000000000000004], [1.5, -2.5, 3.5])],
        "a array<double>, b array<double>",
    )
    row = df.select(
        V.l2_distance(F.col("a"), F.col("b")).alias("py_l2"),
        F.expr("l2_distance(a, b)").alias("sql_l2"),
        V.dot(F.col("a"), F.col("b")).alias("py_dot"),
        F.expr("dot_product(a, b)").alias("sql_dot"),
        V.cosine_similarity(F.col("a"), F.col("b")).alias("py_cos"),
        F.expr("cosine_similarity(a, b)").alias("sql_cos"),
    ).collect()[0]
    assert row.py_l2 == row.sql_l2
    assert row.py_dot == row.sql_dot
    assert row.py_cos == row.sql_cos


def test_right_clamps_when_n_exceeds_length(spark):
    """ADVICE r1: right('abc', 5) must return 'abc', not 'c'."""
    from pyspark.sql import functions as F

    from glaredb_spark.functions.scalar import fn

    df = spark.createDataFrame([("abc",)], "s string")
    row = df.select(
        fn["right"](F.col("s"), 5).alias("over"),
        fn["right"](F.col("s"), 2).alias("normal"),
        fn["right"](F.col("s"), 3).alias("exact"),
    ).collect()[0]
    assert row.over == "abc"
    assert row.normal == "bc"
    assert row.exact == "abc"


def test_shell_split_sql_quote_aware():
    """ADVICE r1: semicolons inside string literals must not split."""
    from glaredb_spark.shell import _split_sql

    stmts = _split_sql("SELECT 'a;b' AS x; SELECT ';''; ' AS y;\nSELECT 1")
    assert stmts[0] == "SELECT 'a;b' AS x"
    assert stmts[1] == " SELECT ';''; ' AS y"
    assert stmts[2].strip() == "SELECT 1"
    assert len(stmts) == 3

"""Salted join / salted aggregation: result identity with unsalted plans,
salt-count invariance, and rejection of non-decomposable aggregates."""

import pytest
from pyspark.sql import functions as F

from glaredb_spark.operators.skew import salted_groupby, salted_join


def _skewed_df(spark):
    # 10k rows, 90% on one key — a genuinely hot key
    return spark.range(10_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).alias("v"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame([("hot", 2), ("cold", 3)], ["k", "w"])
    plain = big.join(small, "k").select("id", "k", "v", "w")
    salted = salted_join(big, small, ["k"], n_salts=8, unique_col="id").select(
        "id", "k", "v", "w"
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_left_outer(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame([("hot", 2)], ["k", "w"])  # cold unmatched
    plain = big.join(small, "k", "left").select("id", "k", "w")
    salted = salted_join(
        big, small, ["k"], n_salts=4, how="left", unique_col="id"
    ).select("id", "k", "w")
    assert _rows(salted) == _rows(plain)


def test_salted_groupby_matches_plain_and_is_salt_invariant(spark):
    df = _skewed_df(spark)
    specs = {
        "n": ("count", "id"),
        "sv": ("sum", "v"),
        "mn": ("min", "v"),
        "mx": ("max", "v"),
    }
    plain = _rows(
        df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )
    for n_salts in (1, 8, 32):
        got = _rows(salted_groupby(df, ["k"], specs, n_salts=n_salts, unique_col="id"))
        assert got == plain, f"n_salts={n_salts}"


def test_salted_groupby_rejects_non_decomposable(spark):
    df = _skewed_df(spark)
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_groupby(df, ["k"], {"a": ("avg", "v")}, n_salts=4)


def test_salted_join_spreads_hot_key(spark):
    # the salt column must actually split the hot key's rows: count the
    # distinct salt partitions the hot key lands in pre-join
    from glaredb_spark.operators.skew import _SALT, _salt_col

    big = _skewed_df(spark)
    n = (
        big.withColumn(_SALT, _salt_col(big, 8, "id"))
        .filter(F.col("k") == "hot")
        .select(_SALT)
        .distinct()
        .count()
    )
    assert n == 8

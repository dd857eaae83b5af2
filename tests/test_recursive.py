"""recursive_cte semantics: fixpoint on cyclic graphs, UNION ALL mode,
runaway guard."""

import pytest
from pyspark.sql import functions as F


def test_union_fixpoint_with_cycle(spark):
    from glaredb_spark.operators.recursive import recursive_cte

    # 1 -> 2 -> 3 -> 1 cycle plus 3 -> 4 leaf
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    got = recursive_cte(
        seeds,
        lambda f: f.join(edges, f["node"] == edges["src"]).select(
            F.col("dst").alias("node")
        ),
    )
    assert sorted(r.node for r in got.collect()) == [1, 2, 3, 4]


def test_union_all_accumulates_paths(spark):
    from glaredb_spark.operators.recursive import recursive_cte

    # chain 1 -> 2 -> 3; UNION ALL keeps one row per path step
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    seeds = spark.createDataFrame([(1,)], "node int")
    got = recursive_cte(
        seeds,
        lambda f: f.join(edges, f["node"] == edges["src"]).select(
            F.col("dst").alias("node")
        ),
        union_all=True,
    )
    assert sorted(r.node for r in got.collect()) == [1, 2, 3]


def test_runaway_recursion_raises(spark):
    from glaredb_spark.operators.recursive import recursive_cte

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
    seeds = spark.createDataFrame([(1,)], "node int")
    with pytest.raises(RuntimeError, match="did not converge"):
        recursive_cte(
            seeds,
            lambda f: f.join(edges, f["node"] == edges["src"]).select(
                F.col("dst").alias("node")
            ),
            union_all=True,  # cycle never empties the frontier
            max_iter=5,
        )

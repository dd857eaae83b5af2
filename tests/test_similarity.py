"""Two-phase top-k (VERDICT r1 fix): exactness vs a window-rank reference,
and plan-shape assertions — the exchange keyed by query_id must carry only
the mapInPandas-reduced candidate set, never the full scored set."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_topk_per_key_matches_window_rank(spark):
    """Property: topk_per_key == row_number-window top-k on random data with
    duplicate scores (tie-break by ident), regardless of partitioning."""
    from glaredb_spark.operators.similarity import topk_per_key

    rng = random.Random(42)
    rows = [
        (q, i, rng.choice([0.1, 0.25, 0.25, 0.5, 0.9]))  # deliberate ties
        for q in range(7)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id int, cosine double"
    ).repartition(13)

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    expected = sorted(
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 4)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .collect()
    )
    got = sorted(topk_per_key(df, 4).collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in expected]


def test_knn_plan_two_phase_no_window(spark, sf_dir):
    """The physical plan must show the partition-local MapInPandas reduction
    and NO window over the full scored set (the r1 parallelism collapse)."""
    from glaredb_spark.operators.similarity import (
        knn_bruteforce_cosine,
        knn_lsh_cosine,
    )
    from glaredb_spark.plans import formatted_plan

    for q in (knn_bruteforce_cosine, knn_lsh_cosine):
        plan = formatted_plan(q(spark, sf_dir))
        # r15: phase 1 is the fused MapInArrow score+local-top-k kernel
        # (was a HOF-scored projection + MapInPandas top-k)
        assert "MapInArrow" in plan, plan
        assert "Window" not in plan, plan
        assert "row_number" not in plan, plan

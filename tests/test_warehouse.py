"""Bucketed tables: the co-located join must run with NO exchange on the
bucketed key, and results must equal the plain-parquet join."""

from pyspark.sql import functions as F


def test_bucketed_join_no_exchange(spark, sf_dir):
    from glaredb_spark.plans import formatted_plan
    from glaredb_spark.sources.files import read_parquet
    from glaredb_spark.warehouse import bucketed_order_join, create_bucketed_tables

    create_bucketed_tables(spark, sf_dir, buckets=4, prefix="tb_")
    # at fixture scale Spark would broadcast the small side (also
    # shuffle-free, but not the path under test); force sort-merge to
    # exercise the bucketed co-location, as it would be chosen at TB scale
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        joined = bucketed_order_join(spark, prefix="tb_")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        # no exchange feeds the join: bucketing already co-locates both sides
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)

    # same results as the plain-parquet formulation
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    plain = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    got = sorted(map(tuple, joined.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want

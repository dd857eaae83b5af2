"""Catalog/DDL surface + sinks (COPY TO analog — the reference stubs COPY
TO at plan_copy.rs:25; we ship working writers)."""

import os

from pyspark.sql import functions as F


def test_ctas_insert_drop(spark, sf_dir, tmp_path):
    from glaredb_spark import catalog as cat

    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    cat.create_table_as(nation.limit(10), "t_nation_ctas")
    assert spark.table("t_nation_ctas").count() == 10
    cat.insert_into(nation.limit(5), "t_nation_ctas")
    assert spark.table("t_nation_ctas").count() == 15
    assert "t_nation_ctas" in cat.list_tables(spark)
    cat.drop_table(spark, "t_nation_ctas")
    assert "t_nation_ctas" not in cat.list_tables(spark)


def test_views_store_sql(spark, sf_dir):
    from glaredb_spark import catalog as cat

    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).createOrReplaceTempView(
        "region"
    )
    cat.create_view(spark, "v_regions", "SELECT r_name FROM region WHERE r_regionkey < 3")
    assert spark.table("v_regions").count() == 3
    cat.drop_view(spark, "v_regions")


def test_describe_reference_type_names(spark, sf_dir):
    from glaredb_spark.catalog import describe

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    d = {r.column_name: r.datatype for r in describe(li).collect()}
    assert d["l_orderkey"] == "Int64"
    assert d["l_linenumber"] == "Int32"
    assert d["l_quantity"] == "Float64"
    assert d["l_returnflag"] == "Utf8"
    assert d["l_shipdate"] == "Timestamp(µs)"
    dec = li.select(F.col("l_quantity").cast("decimal(15,2)").alias("q"))
    assert describe(dec).collect()[0].datatype == "Decimal64(15,2)"
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    assert {r.column_name: r.datatype for r in describe(emb).collect()}[
        "embedding"
    ] == "List[Float32]"  # reference display, list_value.slt:49


def test_parquet_csv_sinks_roundtrip(spark, sf_dir, tmp_path):
    """df.write.parquet/csv — the working COPY TO equivalent."""
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    pq_dir = str(tmp_path / "out_parquet")
    nation.write.mode("overwrite").parquet(pq_dir)
    back = spark.read.parquet(pq_dir)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)

    csv_dir = str(tmp_path / "out_csv")
    nation.write.mode("overwrite").option("header", True).csv(csv_dir)
    back_csv = spark.read.csv(csv_dir, header=True, inferSchema=True)
    assert back_csv.count() == nation.count()
    assert (
        back_csv.agg(F.sum("n_nationkey")).collect()[0][0]
        == nation.agg(F.sum("n_nationkey")).collect()[0][0]
    )


def test_analyze_table_records_stats(spark, sf_dir):
    """ANALYZE TABLE persists rowCount/sizeInBytes into the catalog; column
    stats record NDV for the CBO (reference: statistics/hll.rs NDV +
    cardinality propagation, computed per-query there, persisted here)."""
    from glaredb_spark.catalog import analyze_table, drop_table, table_stats

    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    nation.write.mode("overwrite").saveAsTable("stats_nation")
    try:
        analyze_table(spark, "stats_nation")
        stats = table_stats(spark, "stats_nation")
        assert "statistics" in stats and "25 rows" in stats["statistics"]
        analyze_table(spark, "stats_nation", ["n_nationkey", "n_regionkey"])
        ndv = (
            spark.sql("DESCRIBE EXTENDED stats_nation n_regionkey")
            .filter(F.col("info_name") == "distinct_count")
            .collect()
        )
        assert ndv and int(ndv[0]["info_value"]) == 5
    finally:
        drop_table(spark, "stats_nation")


def test_attach_detach_memory(spark):
    """slt/standard/attach/memory.slt behavior: attach, duplicate-attach
    error, detach, missing-detach error."""
    import pytest

    from glaredb_spark import catalog as cat

    cat.attach_database(spark, "t_att_mem")
    assert "t_att_mem" in cat.list_attached(spark)
    spark.sql("CREATE TABLE t_att_mem.t1 AS SELECT 1 AS x")
    assert spark.sql("SELECT x FROM t_att_mem.t1").first().x == 1
    with pytest.raises(ValueError, match="already attached"):
        cat.attach_database(spark, "t_att_mem")
    cat.detach_database(spark, "t_att_mem")
    assert "t_att_mem" not in cat.list_attached(spark)
    with pytest.raises(ValueError, match="doesn't exist"):
        cat.detach_database(spark, "t_att_mem")
    # re-attach after detach is allowed (slt does exactly this)
    cat.attach_database(spark, "t_att_mem")
    cat.detach_database(spark, "t_att_mem")


def test_attach_directory_external_tables(spark, sf_dir):
    """Attaching a fixture dir registers each parquet as an external table
    under the alias; detach drops metadata only (files untouched)."""
    from glaredb_spark import catalog as cat

    cat.attach_database(spark, "t_att_dir", path=sf_dir)
    plain = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    assert spark.table("t_att_dir.nation").count() == plain
    joined = spark.sql(
        "SELECT n.n_name, COUNT(*) AS c FROM t_att_dir.nation n "
        "JOIN t_att_dir.customer c ON n.n_nationkey = c.c_nationkey "
        "GROUP BY n.n_name ORDER BY n.n_name"
    )
    assert joined.count() == 25
    cat.detach_database(spark, "t_att_dir")
    assert os.path.exists(os.path.join(sf_dir, "nation.parquet"))


def test_attach_sql_statements(spark, sf_dir):
    """ATTACH/DETACH via the SQL surface (GlareSession.sql)."""
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    assert sess.sql("ATTACH MEMORY DATABASE AS t_att_sql").first().status
    sess.sql(f"ATTACH '{sf_dir}' AS t_att_sql2")
    assert sess.sql("SELECT COUNT(*) AS c FROM t_att_sql2.region").first().c == 5
    sess.sql("DETACH DATABASE t_att_sql")
    sess.sql("DETACH DATABASE t_att_sql2")

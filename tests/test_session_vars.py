"""Session-variable registry (reference config/session.rs; SLTs
slt/standard/vars/* + parallelism/arbitrary_values.slt): SET x TO/= v,
RESET x, RESET ALL, SHOW x, with the reference's validation errors."""

import pytest


@pytest.fixture()
def sess(spark):
    from glaredb_spark import GlareSession

    s = GlareSession(spark)
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    yield s
    spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_set_show_reset_roundtrip(sess):
    sess.sql("SET application_name TO 'test'")
    assert sess.sql("SHOW application_name").collect()[0][0] == "test"
    sess.sql("SET application_name = 'test1'")
    assert sess.sql("SHOW application_name").collect()[0][0] == "test1"
    sess.sql("RESET application_name")
    assert sess.sql("SHOW application_name").collect()[0][0] == ""


def test_partitions_maps_to_shuffle_partitions(sess, spark):
    sess.sql("SET partitions TO 7")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    assert sess.sql("SHOW partitions").collect()[0][0] == "7"


def test_validation_errors_match_reference(sess):
    with pytest.raises(Exception, match="Partition count cannot be less than 1"):
        sess.sql("SET partitions TO 0")
    with pytest.raises(
        Exception, match="Partition count cannot be greater than 512"
    ):
        sess.sql("SET partitions TO 513")
    with pytest.raises(Exception, match="Batch size cannot be less than 1"):
        sess.sql("SET batch_size TO 0")
    with pytest.raises(
        Exception, match="Batch size cannot be greater than 8192"
    ):
        sess.sql("SET batch_size = 8193")
    with pytest.raises(
        Exception, match="Missing setting for 'no_such_var'"
    ):
        sess.sql("SET no_such_var TO true")


def test_reset_all(sess, spark):
    sess.sql("SET application_name TO 'x'")
    sess.sql("SET partitions TO 3")
    sess.sql("RESET ALL")
    assert sess.sql("SHOW application_name").collect()[0][0] == ""
    assert (
        sess.sql("SHOW partitions").collect()[0][0]
        == str(spark.sparkContext.defaultParallelism)
    )


def test_dotted_spark_confs_fall_through(sess, spark):
    # SET spark.sql.* must keep going to Spark SQL, not the registry
    saved = spark.conf.get("spark.sql.maxMetadataStringLength")
    try:
        sess.sql("SET spark.sql.maxMetadataStringLength=123")
        assert spark.conf.get("spark.sql.maxMetadataStringLength") == "123"
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", saved)


def test_catalog_shows_untouched(sess):
    # SHOW TABLES/DATABASES keep their catalog meaning
    assert "database_name" in sess.sql("SHOW DATABASES").columns


def test_function_chaining_gated_by_var(sess, sf_dir):
    sess.register_tables(sf_dir)
    q = "SELECT n_name.upper() AS u FROM nation ORDER BY 1 LIMIT 1"
    got = sess.sql(q).collect()[0]["u"]
    assert got == got.upper() and got
    sess.sql("SET enable_function_chaining TO false")
    try:
        with pytest.raises(Exception):
            sess.sql(q)
    finally:
        sess.sql("RESET enable_function_chaining")


def test_show_passthrough_to_spark_sql(sess):
    """SHOW of a name we don't own falls through to Spark SQL instead of
    raising 'Missing setting' (ADVICE r5): SHOW NAMESPACES is valid Spark
    SQL and must keep working."""
    rows = sess.sql("SHOW NAMESPACES").collect()
    assert any("default" in str(r) for r in rows)

"""Native Iceberg reader (sources/iceberg_native.py + avro_lite.py)
against the reference's own test tables — v1 and v2, simple/partitioned/
versioned — plus the metadata table functions the reference exposes
(slt/iceberg/*.slt runs through the SQL surface in test_slt.py)."""

import os

import pytest

ICE = "/root/reference/testdata/iceberg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ICE), reason="reference iceberg testdata not present"
)


@pytest.mark.parametrize(
    "rel,rows",
    [
        ("tables-v1/lineitem_simple", 1000),
        ("tables-v1/lineitem_partitioned", 1000),
        ("tables-v1/lineitem_versioned", 2000),
        ("tables-v2/lineitem_simple", 1000),
        ("tables-v2/lineitem_partitioned", 1000),
        ("tables-v2/lineitem_versioned", 2000),
    ],
)
def test_scan_all_reference_tables(spark, rel, rows):
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    df = read_iceberg_native(spark, f"{ICE}/{rel}")
    assert df.count() == rows
    assert "l_orderkey" in df.columns


def test_scan_matches_direct_parquet(spark):
    """The active-file fold must equal a raw read of the data dir for an
    append-only table."""
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    t = f"{ICE}/tables-v2/lineitem_simple"
    native = read_iceberg_native(spark, t)
    raw = spark.read.parquet(f"{t}/data/*.parquet")
    assert native.count() == raw.count()
    a = native.groupBy().sum("l_quantity").collect()[0][0]
    b = raw.groupBy().sum("l_quantity").collect()[0][0]
    assert a == b


def test_cities_values(spark):
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    df = read_iceberg_native(spark, f"{ICE}/wh/default.db/cities")
    rows = {r.city: (r.lat, r.long) for r in df.collect()}
    assert set(rows) == {"Amsterdam", "San Francisco", "Drachten", "Paris"}


def test_metadata_functions(spark):
    from glaredb_spark.sources import iceberg_native as ice

    t = f"{ICE}/wh/default.db/cities"
    m = ice.metadata_df(spark, t).collect()[0]
    assert m.format_version == 2 and m.location.endswith("cities")
    s = ice.snapshots_df(spark, t).collect()
    assert len(s) == 1 and s[0].sequence_number == 1
    ml = ice.manifest_list_df(spark, t).collect()
    assert len(ml) == 1 and ml[0].content == "data"
    d = ice.data_files_df(spark, t).collect()
    assert d[0].status == "ADDED" and d[0].record_count == 4


def test_versioned_table_uses_latest_snapshot(spark):
    """version-hint/newest metadata.json picks the snapshot containing
    BOTH appends (2000 rows), not the first (1000)."""
    from glaredb_spark.sources import iceberg_native as ice

    t = f"{ICE}/tables-v2/lineitem_versioned"
    snaps = ice.snapshots_df(spark, t).collect()
    assert len(snaps) >= 2
    assert ice.read_iceberg_native(spark, t).count() == 2000


def test_non_iceberg_dir_errors(spark, tmp_path):
    from glaredb_spark.sources.iceberg_native import (
        IcebergError,
        read_iceberg_native,
    )

    with pytest.raises(IcebergError, match="metadata"):
        read_iceberg_native(spark, str(tmp_path))


def test_lakehouse_falls_back_to_native(spark):
    from glaredb_spark.sources.lakehouse import iceberg_available, read_iceberg

    if iceberg_available(spark):
        pytest.skip("connector jar present; fallback path not taken")
    df = read_iceberg(spark, f"{ICE}/tables-v1/lineitem_simple")
    assert df.count() == 1000

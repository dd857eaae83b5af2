"""Native Iceberg append writer (sources/iceberg_native.py:
write_iceberg_native) — round-trips through the native reader and the
metadata table functions."""

import pytest

from glaredb_spark.sources.iceberg_native import (
    IcebergError,
    data_files_df,
    read_iceberg_native,
    snapshots_df,
    write_iceberg_native,
)


def _docs(spark, sf_dir, lo, hi):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(f"doc_id >= {lo} AND doc_id < {hi}")
        .select("doc_id", "lang", "n_chars")
    )


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_roundtrip_and_metadata(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice")
    s1 = write_iceberg_native(_docs(spark, sf_dir, 0, 40), path)
    s2 = write_iceberg_native(_docs(spark, sf_dir, 40, 70), path)
    assert (s1, s2) == (1, 2)
    got = read_iceberg_native(spark, path)
    assert _collect(got) == _collect(_docs(spark, sf_dir, 0, 70))
    snaps = snapshots_df(spark, path).collect()
    assert [r["snapshot_id"] for r in snaps] == [1, 2]
    files = data_files_df(spark, path).collect()
    assert files and all(r["file_format"] == "PARQUET" for r in files)
    assert sum(r["record_count"] for r in files) == 70
    # second snapshot's manifest list carries snapshot-1 manifests forward
    statuses = {r["status"] for r in files}
    assert "ADDED" in statuses


def test_schema_mismatch_rejected(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice")
    write_iceberg_native(_docs(spark, sf_dir, 0, 10), path)
    with pytest.raises(IcebergError, match="schema mismatch"):
        write_iceberg_native(
            _docs(spark, sf_dir, 0, 10).drop("n_chars"), path
        )


def test_unmappable_type_rejected(spark, tmp_path):
    df = spark.createDataFrame([([1, 2],)], "xs array<int>")
    with pytest.raises(IcebergError, match="cannot map"):
        write_iceberg_native(df, str(tmp_path / "ice"))

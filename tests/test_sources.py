"""Source/table-function conformance (SURVEY.md §2.2)."""

import os

from pyspark.sql import functions as F


def test_generate_series_inclusive(spark):
    from glaredb_spark.sources.files import generate_series

    # reference series.rs:84 — inclusive stop
    got = [r[0] for r in generate_series(spark, 1, 5).collect()]
    assert got == [1, 2, 3, 4, 5]
    got = [r[0] for r in generate_series(spark, 10, 2, -3).orderBy(F.col("generate_series").desc()).collect()]
    assert got == [10, 7, 4]


def test_read_parquet_ns_normalization(spark, sf_dir):
    from glaredb_spark.sources.files import read_parquet

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    # truncation matches DuckDB (integer div by 1000)
    import duckdb

    d_min = duckdb.sql(
        f"SELECT min(ts) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    s_min = ev.agg(F.min("ts")).collect()[0][0]
    assert s_min == d_min


def test_read_csv_and_text(spark, tmp_path):
    from glaredb_spark.sources.files import read_csv, read_text

    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["a", "b"]
    assert df.count() == 2
    # csv integer inference is Int64 for reference parity (schema.rs)
    assert dict(df.dtypes)["a"] == "bigint"

    t = tmp_path / "note.txt"
    t.write_text("hello text source")
    td = read_text(spark, str(t))
    assert td.columns == ["content"]  # read_text.rs: single content column
    row = td.collect()[0]
    assert row.content == "hello text source"
    # source-file attribution comes from the _filename virtual column
    from glaredb_spark.sources.files import with_filename

    named = with_filename(
        spark.read.format("binaryFile").load(str(t))
    ).collect()[0]
    assert named._filename.endswith("note.txt")


def test_glob(spark, tmp_path):
    from glaredb_spark.sources.files import glob_files

    for n in ["a1.txt", "a2.txt", "b.dat"]:
        (tmp_path / n).write_text("x")
    df = glob_files(spark, str(tmp_path / "*.txt"))
    names = [os.path.basename(r[0]) for r in df.collect()]
    assert names == ["a1.txt", "a2.txt"]


def test_parquet_metadata(spark, sf_dir):
    from glaredb_spark.sources.files import (
        parquet_column_metadata,
        parquet_file_metadata,
        parquet_rowgroup_metadata,
    )

    p = os.path.join(sf_dir, "lineitem.parquet")
    fm = parquet_file_metadata(spark, p).collect()
    assert fm[0].num_rows == 6000
    rg = parquet_rowgroup_metadata(spark, p)
    assert rg.agg(F.sum("num_rows")).collect()[0][0] == 6000
    cm = parquet_column_metadata(spark, p).collect()
    # reference schema (slt/parquet/column_metadata.slt): ordinals +
    # physical types + page offsets, one row per (rowgroup, column)
    n_cols = len(spark.read.parquet(p).columns)
    assert {r.column_ordinal for r in cm} == set(range(n_cols))
    assert all(r.num_values > 0 and r.data_page_offset >= 4 for r in cm)
    assert {r.physical_type for r in cm} & {"INT64", "DOUBLE", "BYTE_ARRAY"}


def test_session_facade(sf_dir):
    import glaredb_spark as gdb

    sess = gdb.connect(master="local[2]", app_name="facade_test", sf_dir=sf_dir)
    assert "lineitem" in sess.list_tables()
    n = sess.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert n == 6000
    # SQL surface includes registered reference-name functions
    assert sess.sql("SELECT strpos('abc','b')").collect()[0][0] == 2


def test_widen_partitions_noop_when_wide(spark):
    """The scale-safety contract: a source that already has >= cores
    partitions passes through with NO added exchange; a single-split
    source is spread to default parallelism."""
    from glaredb_spark.sources.files import widen_partitions

    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism + 4)
    assert widen_partitions(wide) is wide  # identical object — no-op

    narrow = spark.range(0, 1000, 1, 1)
    widened = widen_partitions(narrow)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert widened.count() == 1000


def test_widen_floor_is_bytes_adaptive(spark, tmp_path, monkeypatch):
    """r15 scale-adaptive widen: a tiny single-file scan widens to
    total_bytes // SPARK_GRAFT_WIDEN_MIN_BYTES partitions (capped at
    cores, floored at 1) instead of unconditionally fanning into cores
    sub-floor tasks; floor<=0 restores the unconditional behavior; rows
    are unchanged either way."""
    import os as _os

    from glaredb_spark.sources.files import _widen_count, load_wide

    cores = spark.sparkContext.defaultParallelism
    assert _widen_count(cores, 0) == cores            # unknown size: cores
    assert _widen_count(cores, 10) == 1               # tiny: never 0
    assert _widen_count(cores, 9 * 64 * 1024) == min(cores, 9)
    assert _widen_count(cores, 10**12) == cores       # large: cap binds
    monkeypatch.setenv("SPARK_GRAFT_WIDEN_MIN_BYTES", "0")
    assert _widen_count(cores, 10) == cores           # env opt-out
    monkeypatch.delenv("SPARK_GRAFT_WIDEN_MIN_BYTES")

    d = tmp_path / "sfx"
    d.mkdir()
    spark.range(0, 1000, 1, 1).selectExpr("id AS doc_id").coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    df = load_wide(spark, str(d), "documents")
    size = sum(
        _os.path.getsize(_os.path.join(r, f))
        for r, _, fs in _os.walk(d / "documents.parquet")
        for f in fs
        if not f.startswith((".", "_"))
    )
    expect = max(1, min(cores, size // (64 * 1024)))
    assert df.rdd.getNumPartitions() == expect
    assert df.count() == 1000

"""r10: Structured Streaming SOURCE over Iceberg appends (PySpark 4
Python DataSource API) — offsets by sequence number, one executor-side
Arrow partition per added data file, iceberg-spark streaming-source
semantics for non-append snapshots."""

import pytest

from glaredb_spark.sources.iceberg_native import (
    delete_iceberg_native,
    optimize_iceberg_native,
    write_iceberg_native,
)
from glaredb_spark.streaming.source import register_stream_sources


def _drain(spark, path, name):
    q = (
        spark.readStream.format("iceberg_appends")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_iceberg_appends_stream(spark, tmp_path):
    register_stream_sources(spark)
    p = str(tmp_path / "src")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).repartition(2),
        p, format_version=2,
    )
    write_iceberg_native(
        spark.createDataFrame([(100, "x")], "id long, v string"), p
    )
    got = _drain(spark, p, "ice_stream_1")
    assert got.count() == 11
    assert {r["id"] for r in got.filter("id >= 100").collect()} == {100}
    # OPTIMIZE is a reorganization: a fresh stream over the compacted
    # table still sees each row ONCE (replace snapshots are silent, the
    # pre-compaction appends supply the rows)
    optimize_iceberg_native(spark, p)
    got2 = _drain(spark, p, "ice_stream_2")
    assert got2.count() == 11
    # added columns null-fill in earlier files
    from glaredb_spark.sources.iceberg_native import (
        add_column_iceberg_native,
    )

    add_column_iceberg_native(p, "score", "long")
    write_iceberg_native(
        spark.createDataFrame([(200, "y", 5)],
                              "id long, v string, score long"), p
    )
    got3 = _drain(spark, p, "ice_stream_3")
    assert got3.count() == 12
    rows = {r["id"]: r["score"] for r in got3.collect()}
    assert rows[200] == 5 and rows[100] is None


def test_iceberg_appends_stream_non_append(spark, tmp_path):
    register_stream_sources(spark)
    p = str(tmp_path / "srcd")
    write_iceberg_native(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        .coalesce(1),
        p, format_version=2,
    )
    delete_iceberg_native(spark, p, "id = 1", strategy="cow")
    # default: the overwrite snapshot fails the stream
    q = (
        spark.readStream.format("iceberg_appends")
        .option("path", p)
        .load()
        .writeStream.format("memory")
        .queryName("ice_stream_fail")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append stream|STREAM"):
        q.awaitTermination(120)
    # skip_non_appends drops the whole overwrite snapshot (documented
    # iceberg-spark streaming-skip-overwrite-snapshots behavior)
    q2 = (
        spark.readStream.format("iceberg_appends")
        .option("path", p)
        .option("skip_non_appends", "true")
        .load()
        .writeStream.format("memory")
        .queryName("ice_stream_skip")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = spark.sql("SELECT * FROM ice_stream_skip")
    assert {r["id"] for r in got.collect()} == {1, 2}  # the append only


def test_iceberg_appends_stream_incremental(spark, tmp_path):
    """Checkpointed incremental consumption: a second availableNow run
    with the SAME checkpoint processes only the new snapshots."""
    register_stream_sources(spark)
    p = str(tmp_path / "srci")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, v string"), p,
        format_version=2,
    )

    def run():
        q = (
            spark.readStream.format("iceberg_appends")
            .option("path", p)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 1
    write_iceberg_native(
        spark.createDataFrame([(2, "b"), (3, "c")], "id long, v string"),
        p,
    )
    run()
    got = spark.read.parquet(out)
    assert got.count() == 3  # exactly once each: 1 old + 2 new
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]

def test_delta_appends_stream(spark, tmp_path):
    """Delta twin: versions as offsets; partitioned + column-mapped
    tables project through physical names and constant-fill partition
    columns on executors; a removing commit fails unless skipped."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        write_delta_native,
    )

    register_stream_sources(spark)
    p = str(tmp_path / "dsrc")
    write_delta_native(
        spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(10)],
            "id long, part string, score long",
        ),
        p, partition_by=["part"], column_mapping="name",
    )
    write_delta_native(
        spark.createDataFrame([(100, "a", 7)],
                              "id long, part string, score long"),
        p, mode="append",
    )

    def drain(name, skip=False):
        r = (spark.readStream.format("delta_appends")
             .option("path", p))
        if skip:
            r = r.option("skip_non_appends", "true")
        q = (r.load().writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.sql(f"SELECT * FROM {name}")

    got = drain("delta_stream_1")
    assert got.count() == 11
    rows = {r["id"]: (r["part"], r["score"]) for r in got.collect()}
    assert rows[100] == ("a", 7)
    assert rows[3] == ("b", 30)  # partition value constant-filled
    # a removing commit fails the stream; skip_non_appends drops it
    delete_delta_native(spark, p, "id = 2")
    q = (spark.readStream.format("delta_appends").option("path", p)
         .load().writeStream.format("memory")
         .queryName("delta_stream_fail").trigger(availableNow=True)
         .start())
    import pytest as _pytest

    with _pytest.raises(Exception, match="append stream|STREAM"):
        q.awaitTermination(120)
    got2 = drain("delta_stream_2", skip=True)
    assert got2.count() == 11

def test_iceberg_stream_gap_and_v1_guards(spark, tmp_path):
    """r10 review #2/#5: expired snapshots inside a checkpointed range
    fail the stream (parent-chain continuity), and external v1 metadata
    without sequence numbers is refused instead of yielding nothing."""
    import json as _json
    import glob as _glob
    import os as _os

    from glaredb_spark.sources.iceberg_native import (
        expire_snapshots_iceberg_native,
    )

    register_stream_sources(spark)
    p = str(tmp_path / "gap")
    ckpt = str(tmp_path / "gapckpt")
    out = str(tmp_path / "gapout")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, v string"), p,
        format_version=2,
    )

    def run():
        q = (spark.readStream.format("iceberg_appends")
             .option("path", p).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()  # checkpoint at snapshot 1
    write_iceberg_native(
        spark.createDataFrame([(2, "b")], "id long, v string"), p
    )
    write_iceberg_native(
        spark.createDataFrame([(3, "c")], "id long, v string"), p
    )
    expire_snapshots_iceberg_native(p, retention_hours=0, retain_last=1)
    with pytest.raises(Exception, match="expired|STREAM"):
        run()

    # external v1 metadata without sequence numbers is refused
    p2 = str(tmp_path / "v1x")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, v string"), p2
    )
    for mf in _glob.glob(_os.path.join(p2, "metadata", "*.metadata.json")):
        m = _json.load(open(mf))
        for s in m.get("snapshots", []):
            s.pop("sequence-number", None)
        _json.dump(m, open(mf, "w"))
    q = (spark.readStream.format("iceberg_appends")
         .option("path", p2).load()
         .writeStream.format("memory").queryName("v1x_stream")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="sequence numbers|STREAM"):
        q.awaitTermination(120)


# --- r11: changelog streams (readStream over iceberg.changes / delta.changes)

def _drain_fmt(spark, fmt, path, name, **opts):
    r = spark.readStream.format(fmt).option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (r.load().writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_iceberg_changes_stream_equals_batch(spark, tmp_path):
    """Stream ≡ batch changelog over MoR DML: eq-delete upsert commits
    surface delete+insert rows per micro-batch, matching
    changes_iceberg_native's net form row-for-row (the stream cannot
    pair updates — that is a batch-only identifier-fields feature)."""
    from glaredb_spark.sources.iceberg_native import (
        changes_iceberg_native,
        equality_delete_iceberg_native,
        table_metadata,
        upsert_iceberg_native,
    )

    register_stream_sources(spark)
    p = str(tmp_path / "chsrc")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "id long, v string"
        ).coalesce(1),
        p, format_version=2,
    )                                                            # snap 1
    upsert_iceberg_native(
        spark, p,
        spark.createDataFrame([(2, "B"), (100, "new")],
                              "id long, v string"),
        on=["id"],
    )                                                            # snap 2
    equality_delete_iceberg_native(
        spark, p, spark.createDataFrame([(4,)], "id long")
    )                                                            # snap 3
    got = _drain_fmt(spark, "iceberg_changes", p, "ice_chg_1")
    stream_rows = sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_snapshot_id"])
        for r in got.collect()
    )
    meta = table_metadata(p)
    snaps = sorted(
        int(s["snapshot-id"]) for s in meta["snapshots"]
    )
    first = min(
        meta["snapshots"], key=lambda s: s.get("sequence-number", 0)
    )
    batch = changes_iceberg_native(
        spark, p, int(first["snapshot-id"]),
    )
    batch_rows = sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_snapshot_id"])
        for r in batch.collect()
    )
    assert stream_rows == batch_rows
    # spot-check semantics, not just self-consistency
    by = {}
    for rid, v, ct, sid in stream_rows:
        by.setdefault(ct, set()).add(rid)
    assert by["insert"] >= {0, 1, 2, 3, 4, 5, 100}
    assert by["delete"] == {2, 4}  # upsert's preimage + eq delete


def test_iceberg_changes_stream_cow_fails(spark, tmp_path):
    """A COW rewrite is underivable per-file: the stream fails with a
    pointer to batch iceberg.changes / MoR DML."""
    register_stream_sources(spark)
    p = str(tmp_path / "chcow")
    write_iceberg_native(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        .coalesce(1),
        p, format_version=2,
    )
    delete_iceberg_native(spark, p, "id = 1", strategy="cow")
    q = (spark.readStream.format("iceberg_changes").option("path", p)
         .load().writeStream.format("memory").queryName("ice_chg_cow")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="copy-on-write|STREAM"):
        q.awaitTermination(120)


def test_iceberg_changes_stream_removed_only(spark, tmp_path):
    """A whole-file COW delete (removes, no adds) streams every
    previously-visible row of the removed file as a delete."""
    register_stream_sources(spark)
    p = str(tmp_path / "chrm")
    write_iceberg_native(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        .coalesce(1),
        p, format_version=2,
    )
    delete_iceberg_native(spark, p, "id IS NOT NULL", strategy="cow")
    got = _drain_fmt(spark, "iceberg_changes", p, "ice_chg_rm")
    rows = sorted(
        (r["id"], r["_change_type"]) for r in got.collect()
    )
    assert rows == [
        (1, "delete"), (1, "insert"), (2, "delete"), (2, "insert")
    ]


def test_iceberg_changes_stream_incremental(spark, tmp_path):
    """Checkpointed exactly-once: a second availableNow run processes
    only the new snapshot's changes."""
    from glaredb_spark.sources.iceberg_native import (
        equality_delete_iceberg_native,
    )

    register_stream_sources(spark)
    p = str(tmp_path / "chinc")
    ckpt = str(tmp_path / "chckpt")
    out = str(tmp_path / "chout")
    write_iceberg_native(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        .coalesce(1),
        p, format_version=2,
    )

    def run():
        q = (spark.readStream.format("iceberg_changes")
             .option("path", p).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 2  # 2 inserts
    equality_delete_iceberg_native(
        spark, p, spark.createDataFrame([(1,)], "id long")
    )
    run()
    got = spark.read.parquet(out)
    rows = sorted((r["id"], r["_change_type"]) for r in got.collect())
    assert rows == [(1, "delete"), (1, "insert"), (2, "insert")]


def test_delta_changes_stream_equals_batch(spark, tmp_path):
    """Delta CDF stream ≡ batch table_changes: cdc commits replay
    update_preimage/postimage verbatim, blind appends derive inserts,
    and a non-CDF rewrite fails the stream."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        table_changes_delta_native,
        update_delta_native,
        write_delta_native,
    )

    register_stream_sources(spark)
    p = str(tmp_path / "dchg")
    write_delta_native(
        spark.createDataFrame(
            [(i, f"v{i}", i * 10) for i in range(6)],
            "id long, v string, score long",
        ).coalesce(1),
        p, enable_cdf=True,
    )                                                             # v0
    update_delta_native(spark, p, {"score": "score + 1"}, "id < 2")  # v1
    delete_delta_native(spark, p, "id = 5")                          # v2
    got = _drain_fmt(spark, "delta_changes", p, "delta_chg_1")
    stream_rows = sorted(
        (r["id"], r["score"], r["_change_type"], r["_commit_version"])
        for r in got.collect()
    )
    batch = table_changes_delta_native(spark, p, 0)
    batch_rows = sorted(
        (r["id"], r["score"], r["_change_type"], r["_commit_version"])
        for r in batch.collect()
    )
    assert stream_rows == batch_rows
    assert (0, 1, "update_postimage", 1) in stream_rows
    assert (5, 50, "delete", 2) in stream_rows

    # non-CDF rewrite fails the stream
    p2 = str(tmp_path / "dnocdf")
    write_delta_native(
        spark.createDataFrame([(1, "a", 1)],
                              "id long, v string, score long"),
        p2,
    )
    delete_delta_native(spark, p2, "id = 1")
    q = (spark.readStream.format("delta_changes").option("path", p2)
         .load().writeStream.format("memory").queryName("delta_chg_f")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="cannot be derived|STREAM"):
        q.awaitTermination(120)


def test_delta_changes_stream_partitioned_mapped(spark, tmp_path):
    """Column-mapped + partitioned CDF streaming: physical-name scan,
    logical demap, partition constant fill — per micro-batch."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        write_delta_native,
    )

    register_stream_sources(spark)
    p = str(tmp_path / "dmap")
    write_delta_native(
        spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(6)],
            "id long, part string, score long",
        ),
        p, partition_by=["part"], column_mapping="name",
        enable_cdf=True,
    )
    delete_delta_native(spark, p, "id = 3")
    got = _drain_fmt(spark, "delta_changes", p, "delta_chg_map")
    rows = {
        (r["id"], r["_change_type"]): (r["part"], r["score"])
        for r in got.collect()
    }
    assert rows[(3, "delete")] == ("b", 30)
    assert rows[(4, "insert")] == ("a", 40)
    assert len(rows) == 7  # 6 inserts + 1 delete


def test_iceberg_changes_stream_expired_parent_fails(spark, tmp_path):
    """r11 review #1: an iceberg_changes stream whose starting_seq
    predates expired history must FAIL — diffing the oldest retained
    snapshot against an empty file set would re-emit every inherited
    (already-consumed) row as an insert."""
    from glaredb_spark.sources.iceberg_native import (
        expire_snapshots_iceberg_native,
    )

    register_stream_sources(spark)
    p = str(tmp_path / "chexp")
    write_iceberg_native(
        spark.createDataFrame([(i, "a") for i in range(5)],
                              "id long, v string"), p, format_version=2,
    )
    write_iceberg_native(
        spark.createDataFrame([(9, "b")], "id long, v string"), p
    )
    write_iceberg_native(
        spark.createDataFrame([(10, "c")], "id long, v string"), p
    )
    expire_snapshots_iceberg_native(p, retention_hours=0, retain_last=1)
    q = (spark.readStream.format("iceberg_changes")
         .option("path", p).option("starting_seq", "1").load()
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "chexpout"))
         .option("checkpointLocation", str(tmp_path / "chexpckpt"))
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="expired|STREAM"):
        q.awaitTermination(120)


def test_unity_addressed_delta_stream(spark, tmp_path):
    """readStream over a Unity-catalog-addressed Delta table (endpoint +
    table options): storage_location resolves through the catalog; the
    log at that path drives the stream."""
    from glaredb_spark.sources.delta_native import write_delta_native
    from glaredb_spark.sources.unity_emulator import UnityEmulator

    loc = str(tmp_path / "udt")
    write_delta_native(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(5)], "id long, v string"
        ),
        loc,
    )
    emu = UnityEmulator(
        schemas=[{"name": "default", "catalog_name": "u",
                  "comment": ""}],
        tables=[{
            "name": "t", "catalog_name": "u", "schema_name": "default",
            "table_type": "EXTERNAL", "data_source_format": "DELTA",
            "storage_location": f"file://{loc}", "comment": "",
        }],
    )
    endpoint = emu.start()
    try:
        register_stream_sources(spark)
        q = (
            spark.readStream.format("delta_appends")
            .option("endpoint", endpoint)
            .option("table", "u.default.t")
            .load()
            .writeStream.format("memory").queryName("unity_stream")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        assert spark.sql("SELECT * FROM unity_stream").count() == 5
        # a PARQUET-format table is refused by name
        emu.add_table(**{
            "name": "p", "catalog_name": "u", "schema_name": "default",
            "table_type": "EXTERNAL", "data_source_format": "PARQUET",
            "storage_location": f"file://{loc}", "comment": "",
        })
        with pytest.raises(Exception, match="data_source_format"):
            (spark.readStream.format("delta_appends")
             .option("endpoint", endpoint)
             .option("table", "u.default.p").load())
    finally:
        emu.stop()

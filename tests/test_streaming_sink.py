"""Exactly-once streaming Delta sink (streaming/sink.py): stream →
foreachBatch → native Delta table; checkpoint replay must not duplicate."""

from glaredb_spark.sources.delta_native import read_delta_native
from glaredb_spark.streaming.sink import (
    delta_batch_writer,
    last_committed_batch,
    stream_to_delta,
)


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_lands_in_delta(spark, sf_dir, tmp_path):
    from glaredb_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_delta(stream, path, ckpt, app_id="events_ingest").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = read_delta_native(spark, path)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    assert _collect(got) == _collect(batch)
    assert last_committed_batch(path, "events_ingest") >= 0


def test_replayed_batch_is_skipped(spark, sf_dir, tmp_path):
    path = str(tmp_path / "delta")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type"
    )
    writer = delta_batch_writer(path, app_id="app1")
    writer(batch, 0)
    n1 = read_delta_native(spark, path).count()
    writer(batch, 0)  # checkpoint replay of the same batch id
    assert read_delta_native(spark, path).count() == n1
    writer(batch, 1)  # a genuinely new batch appends
    assert read_delta_native(spark, path).count() == 2 * n1
    assert last_committed_batch(path, "app1") == 1
    assert last_committed_batch(path, "other_app") == -1


# --- Iceberg streaming upsert sink (r8) --------------------------------------


def test_upsert_iceberg_batch_semantics(spark, tmp_path):
    """One-snapshot upsert: prior rows with matching keys die via the
    equality delete, the batch's own rows survive (same sequence
    number), unrelated rows untouched."""
    from glaredb_spark.sources.iceberg_native import (
        read_iceberg_native,
        table_metadata,
        upsert_iceberg_native,
        write_iceberg_native,
    )

    path = str(tmp_path / "ice_up")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string"
    )
    write_iceberg_native(base, path, format_version=2)
    batch = spark.createDataFrame(
        [(3, "NEW3"), (7, "NEW7"), (20, "NEW20")], "id long, val string"
    )
    upsert_iceberg_native(spark, path, batch, on=["id"])
    got = {r["id"]: r["val"]
           for r in read_iceberg_native(spark, path).collect()}
    assert len(got) == 11
    assert got[3] == "NEW3" and got[7] == "NEW7" and got[20] == "NEW20"
    assert got[0] == "v0"
    # a second upsert of the same key wins again (newer sequence)
    upsert_iceberg_native(
        spark, path,
        spark.createDataFrame([(3, "NEWER3")], "id long, val string"),
        on=["id"],
    )
    got2 = {r["id"]: r["val"]
            for r in read_iceberg_native(spark, path).collect()}
    assert got2[3] == "NEWER3" and len(got2) == 11
    assert table_metadata(path)["format-version"] == 2


def test_stream_upserts_into_iceberg(spark, tmp_path):
    """End-to-end Structured Streaming upsert with replay idempotence."""
    from glaredb_spark.sources.iceberg_native import read_iceberg_native
    from glaredb_spark.streaming.sink import (
        iceberg_upsert_writer,
        last_committed_batch_iceberg,
        stream_upsert_to_iceberg,
    )

    # foreachBatch-level: replayed batch id is a no-op
    path = str(tmp_path / "ice_s")
    b0 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, val string"
    )
    b1 = spark.createDataFrame(
        [(2, "B"), (3, "c")], "id long, val string"
    )
    w = iceberg_upsert_writer(path, "app1", on=["id"])
    w(b0, 0)
    w(b1, 1)
    snap_count = len(
        __import__("glaredb_spark.sources.iceberg_native",
                   fromlist=["table_metadata"]).table_metadata(path)[
            "snapshots"]
    )
    w(b1, 1)  # checkpoint replay: skipped
    meta2 = __import__("glaredb_spark.sources.iceberg_native",
                       fromlist=["table_metadata"]).table_metadata(path)
    assert len(meta2["snapshots"]) == snap_count
    got = {r["id"]: r["val"]
           for r in read_iceberg_native(spark, path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    assert last_committed_batch_iceberg(path, "app1") == 1
    assert last_committed_batch_iceberg(path, "other") == -1

    # full writeStream drive over a file source
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        [(3, "C2"), (4, "d")], "id long, val string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / "p0"))
    stream = spark.readStream.schema("id long, val string").parquet(
        str(src_dir / "p0")
    )
    q = stream_upsert_to_iceberg(
        stream, path, str(tmp_path / "ckpt"), app_id="app2", on=["id"]
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got2 = {r["id"]: r["val"]
            for r in read_iceberg_native(spark, path).collect()}
    assert got2 == {1: "a", 2: "B", 3: "C2", 4: "d"}


def test_delta_upsert_writer_idempotent(spark, tmp_path):
    """Delta streaming upsert: merge per batch, txn marker on the merge
    commit, checkpoint replays skipped."""
    from glaredb_spark.streaming.sink import delta_upsert_writer

    path = str(tmp_path / "dup")
    w = delta_upsert_writer(path, "appd", on=["id"])
    w(spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string"), 0)
    w(spark.createDataFrame([(2, "B"), (3, "c")], "id long, val string"), 1)
    got = {r["id"]: r["val"]
           for r in read_delta_native(spark, path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    assert last_committed_batch(path, "appd") == 1
    # replay of batch 1: no new version
    from glaredb_spark.sources.delta_native import _latest_version
    import os as _os

    v = _latest_version(_os.path.join(path, "_delta_log"))
    w(spark.createDataFrame([(2, "B"), (3, "c")], "id long, val string"), 1)
    assert _latest_version(_os.path.join(path, "_delta_log")) == v


def test_upsert_rejects_intra_batch_duplicate_keys(spark, tmp_path):
    """Two rows for one key in a batch would BOTH survive the equality
    delete (same sequence number) — refused like MERGE; and batch 0's
    creating commit now carries the idempotence marker."""
    import pytest

    from glaredb_spark.sources.iceberg_native import (
        IcebergError,
        upsert_iceberg_native,
        write_iceberg_native,
    )
    from glaredb_spark.streaming.sink import (
        iceberg_upsert_writer,
        last_committed_batch_iceberg,
    )

    path = str(tmp_path / "dupk")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, val string"),
        path, format_version=2,
    )
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, val string"
    )
    with pytest.raises(IcebergError, match="multiple rows"):
        upsert_iceberg_native(spark, path, dup, on=["id"])
    # creating batch records the marker → replay of batch 0 skipped
    path2 = str(tmp_path / "b0")
    w = iceberg_upsert_writer(path2, "appz", on=["id"])
    w(spark.createDataFrame([(1, "a")], "id long, val string"), 0)
    assert last_committed_batch_iceberg(path2, "appz") == 0


def test_iceberg_upsert_maintenance_every(spark, tmp_path):
    """r9: maintenance_every purges+compacts inline — after 6 batches
    with maintenance_every=3 the table holds NO equality-delete files,
    values are last-wins, and the idempotence markers survive the
    maintenance snapshots (a replayed batch stays a no-op)."""
    from glaredb_spark.sources.iceberg_native import (
        _manifest_entries,
        read_iceberg_native,
        table_metadata,
    )
    from glaredb_spark.streaming.sink import (
        iceberg_upsert_writer,
        last_committed_batch_iceberg,
    )

    path = str(tmp_path / "maint")
    write = iceberg_upsert_writer(path, "app1", ["k"], maintenance_every=3)
    expect = {}
    for b in range(6):
        rows = [(k, f"b{b}") for k in range(b, b + 4)]
        write(spark.createDataFrame(rows, "k long, v string"), b)
        expect.update(dict(rows))
    meta = table_metadata(path)
    contents = [
        (e["data_file"].get("content", 0) or 0)
        for e in _manifest_entries(meta, path)
    ]
    assert all(c == 0 for c in contents)  # maintenance purged the deletes
    got = {r["k"]: r["v"] for r in read_iceberg_native(spark, path).collect()}
    assert got == expect
    # markers survived: replaying the last batch is a no-op
    assert last_committed_batch_iceberg(path, "app1") == 5
    write(spark.createDataFrame([(0, "DUP")], "k long, v string"), 5)
    got2 = {r["k"]: r["v"] for r in read_iceberg_native(spark, path).collect()}
    assert got2 == expect

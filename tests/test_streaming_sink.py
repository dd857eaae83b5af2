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

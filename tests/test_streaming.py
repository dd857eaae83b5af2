"""Structured Streaming extension: file-source stream over the events
fixture, windowed/tumbling/session aggregation with watermarks, memory-sink
drain matches batch results."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream(spark, sf_dir):
    from glaredb_spark.streaming.events import read_events_stream

    return read_events_stream(spark, sf_dir)


def test_stream_is_streaming(stream):
    assert stream.isStreaming


def test_tumbling_stream_matches_batch(spark, sf_dir, stream):
    from glaredb_spark.streaming.events import run_to_memory, tumbling_counts
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    result = run_to_memory(tumbling_counts(stream), "t_tumbling")
    batch = QUERIES["events_tumbling_hourly"](spark, sf_dir)
    s = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in result.collect()
    }
    b = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert s == b


def test_session_window_stream(spark, stream):
    from glaredb_spark.streaming.events import run_to_memory, session_counts

    result = run_to_memory(session_counts(stream), "t_sessions")
    rows = result.collect()
    assert len(rows) > 0
    assert all(r.session_end >= r.session_start for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_session_window_stream_matches_batch_sessionize(spark, sf_dir, stream):
    """session_window sessions must equal the batch lag-based sessionize:
    same (user, start, count, value) — stream end = last event + gap by
    Spark's definition, so end is compared via start of the SAME session."""
    from glaredb_spark.registry import QUERIES, load_all
    from glaredb_spark.streaming.events import run_to_memory, session_counts

    load_all()
    got = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in run_to_memory(session_counts(stream), "t_sessions_eq").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in QUERIES["events_sessionize"](spark, sf_dir).collect()
    }
    assert got == want

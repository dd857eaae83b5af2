"""Streaming joins: stream-static enrichment and watermarked stream-stream
band joins produce exactly the batch-join result on the fixture."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream(spark, sf_dir):
    from glaredb_spark.streaming.events import read_events_stream

    return read_events_stream(spark, sf_dir)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    from glaredb_spark.sources.files import read_parquet

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


def test_stream_static_enrich(spark, stream, events_batch):
    from glaredb_spark.streaming.events import run_to_memory
    from glaredb_spark.streaming.joins import enrich_stream_static

    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    enriched = enrich_stream_static(stream, dim, "event_type")
    got = run_to_memory(
        enriched.groupBy("category").agg(F.count(F.lit(1)).alias("n")),
        "t_enrich",
    )
    want = {
        (r.category, r.n)
        for r in events_batch.join(dim, "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.category, r.n) for r in got.collect()} == want


def test_stream_stream_band_join_matches_batch(spark, stream, events_batch):
    from glaredb_spark.streaming.joins import (
        run_append_to_memory,
        view_purchase_stream_join,
    )

    views_s = stream.filter(F.col("event_type") == "view")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    got = run_append_to_memory(
        view_purchase_stream_join(views_s, purch_s), "t_ss_join"
    )

    v = events_batch.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event"),
        F.col("ts").alias("view_ts"),
    )
    p = events_batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 hour")),
    )
    assert got.count() == batch.count() > 0
    s_keys = {
        (r.user_id, r.view_event, r.purchase_event) for r in got.collect()
    }
    b_keys = {
        (r.v_user, r.view_event, r.purchase_event) for r in batch.collect()
    }
    assert s_keys == b_keys

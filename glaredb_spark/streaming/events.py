"""Structured Streaming versions of the event operators.

The reference engine is batch-only (SURVEY.md §2.7 — no watermark/window/
state code exists in glaredb_core); this module is the north-star streaming
extension. Each builder takes a streaming DataFrame (``readStream``) and
returns the transformed streaming DataFrame; the batch-equivalent semantics
are oracle-checked in glaredb_spark.operators.events.

Scale notes: watermark + windowed aggregation is incremental state in the
state store (RocksDB-backed on a real cluster); sessionization uses
``session_window``, Spark's native gap-based session operator. State size ∝
open windows/sessions, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

D = "decimal(15,2)"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (schema bound from the
    batch read, ns timestamps normalized the same way).

    Spark's file source consumes a *directory*; the fixture dir mixes
    tables, so the events file is exposed through a scratch dir symlink.
    """
    import os
    import tempfile

    stream_dir = tempfile.mkdtemp(prefix="glaredb_events_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(stream_dir)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # watermarks require TIMESTAMP (LTZ); session tz is UTC so values
        # align with the batch TIMESTAMP_NTZ reading
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        # parquet timestamp[us] (isAdjustedToUTC=false) reads as NTZ, which
        # withWatermark rejects; session tz is UTC so this cast is value-exact
        stream = stream.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
    return stream


def tumbling_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hopping_counts(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n_events"
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native gap-based session windows (session_window)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drain all available input into an in-memory sink and return the
    result table (test/driver helper — not for production paths)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    return spark.table(name)

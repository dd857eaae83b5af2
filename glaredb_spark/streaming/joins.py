"""Streaming joins — stream-static enrichment and watermarked
stream-stream joins.

The reference engine is batch-only (SURVEY.md §2.7); these complete the
streaming extension alongside windowed aggs (streaming/events.py) and
stateful ops (streaming/stateful.py, streaming/dedup.py).

Semantics + scale:
- Stream-static: each micro-batch joins against the (small) static side —
  stateless, broadcast per batch, no state store. The standard enrichment
  shape (events x dimension table).
- Stream-stream: both sides watermarked, and the join carries an explicit
  event-time band (purchase within [view.ts, view.ts + bound]) — Spark
  keeps each side's rows in the state store only until the watermark passes
  the band, so state is bounded by (rate x bound), not history. Without
  the band the state grows forever; the API here makes the bound required.

Batch equivalence is asserted in tests/test_streaming_joins.py: the same
join logic over the same fixture as a batch DataFrame gives identical rows
(micro-batch boundaries cannot change an inner band-join's result set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D = "decimal(15,2)"


def enrich_stream_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stateless per-micro-batch enrichment join (stream x static dim)."""
    return stream.join(F.broadcast(dim), on)


def view_purchase_stream_join(
    views: DataFrame,
    purchases: DataFrame,
    bound: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases joined to the views that preceded them within `bound`,
    per user — the attribution shape, as a watermarked stream-stream
    inner join.

    Both inputs must be streaming frames with an event-time `ts`.
    Output: (user_id, view_event, purchase_event, view_ts, purchase_ts,
    purchase_value).
    """
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").cast(D).cast("double").alias("purchase_value"),
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {bound}")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_event",
        "purchase_event",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "purchase_value",
    )


def run_append_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drain all available input through an APPEND-mode memory sink (joins
    emit append-only) and return the result table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.table(name)

"""applyInPandasWithState custom stateful operator: stream-computed per-user
running totals must equal the batch groupBy aggregate."""

import pytest
from pyspark.sql import functions as F


def test_running_user_totals_matches_batch(spark, sf_dir):
    from glaredb_spark.streaming.events import read_events_stream
    from glaredb_spark.streaming.stateful import running_user_totals

    stream = read_events_stream(spark, sf_dir)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in spark.table("t_stateful").collect()
    }

    from glaredb_spark.sources.files import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total"),
        F.max("value").alias("mx"),
    )
    expect = {r.user_id: (r.n, r.total, r.mx) for r in batch.collect()}
    assert set(got) == set(expect)
    for uid, (n, total, mx) in expect.items():
        gn, gt, gm = got[uid]
        assert gn == n, uid
        assert gt == total, uid  # per-row cent rounding is batch-invariant
        assert gm == mx, uid

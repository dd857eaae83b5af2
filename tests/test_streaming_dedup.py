"""Streaming exact dedup: cross-micro-batch state must flag duplicates that
arrive in LATER batches than their originals."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_streaming_dedup_cross_batch(spark, tmp_path):
    from glaredb_spark.sources.files import read_parquet
    from glaredb_spark.streaming.dedup import dedup_exact_stream

    docs = read_parquet(spark, f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    n_digests = docs.select(F.md5("text")).distinct().count()

    # batch 1: the corpus; batch 2: the same texts under shifted doc_ids —
    # every batch-2 row must be flagged duplicate via cross-batch state
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    docs.coalesce(1).write.parquet(str(stream_dir / "batch1.parquet"))
    docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).coalesce(1).write.parquet(str(stream_dir / "batch2.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*.parquet")
    )
    q = (
        dedup_exact_stream(stream)
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("t_dedup_stream").collect()

    assert len(out) == 2 * n_docs  # one row per arriving doc
    firsts = [r for r in out if r.is_first]
    assert len(firsts) == n_digests  # one admission per distinct content
    assert all(r.doc_id < 1_000_000 for r in firsts)  # all from batch 1
    # every batch-2 row is a duplicate pointing at its batch-1 original
    b2 = [r for r in out if r.doc_id >= 1_000_000]
    assert len(b2) == n_docs and all(not r.is_first for r in b2)
    assert all(r.first_doc_id < 1_000_000 for r in b2)


def test_streaming_minhash_candidates_cross_batch(spark, tmp_path):
    """Near-dup buckets persist across micro-batches: a doc whose text was
    seen in an earlier batch collides in every band with its original."""
    from glaredb_spark.sources.files import read_parquet
    from glaredb_spark.streaming.dedup import minhash_candidates_stream

    docs = (
        read_parquet(spark, f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
        .cache()
    )
    stream_dir = tmp_path / "mh_stream"
    stream_dir.mkdir()
    docs.coalesce(1).write.parquet(str(stream_dir / "b1.parquet"))
    docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text").coalesce(
        1
    ).write.parquet(str(stream_dir / "b2.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*.parquet")
    )
    q = (
        minhash_candidates_stream(stream)
        .writeStream.format("memory")
        .queryName("t_mh_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("t_mh_stream").collect()

    from glaredb_spark.operators.dedup import BANDS

    n_docs = docs.count()
    assert len(out) == 2 * n_docs * BANDS  # every doc lands in every band
    # every batch-2 doc collides with its batch-1 twin in ALL bands
    b2 = [r for r in out if r.doc_id >= 1_000_000]
    assert all(not r.is_first for r in b2)
    assert all(r.first_doc_id == r.doc_id - 1_000_000 or r.first_doc_id < 1_000_000
               for r in b2)
    by_doc = {}
    for r in b2:
        by_doc.setdefault(r.doc_id, set()).add(r.band)
    assert all(len(bands) == BANDS for bands in by_doc.values())

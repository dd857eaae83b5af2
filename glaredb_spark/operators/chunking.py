"""Corpus chunking + deterministic epoch shuffling for training pipelines.

Two operators a RAG / LLM-training data pipeline needs that go beyond the
reference's relational surface (BASELINE.json north star — the reference is
the query engine such a pipeline runs on):

- ``text_chunk_overlap`` — split every document into fixed-width,
  overlapping character windows (the retrieval-chunking shape: window W,
  stride S < W). Pure JVM expression work (sequence → explode →
  substring → md5): map-only, zero shuffle, scales linearly with corpus
  bytes at any cluster size.

- ``pipeline_epoch_shuffle`` — a deterministic global shuffle into
  training shards: shuffle key = md5(epoch_salt ‖ doc_id) (identical in
  every engine, no RNG state), shard = 48 bits of the key mod n_shards,
  within-shard position = rank by key. The only shuffle is the
  hash-partition on ``shard`` feeding per-shard window ranks — at 100 TB
  that is exactly the exchange a shard writer needs anyway (each shard
  lands ordered, ready to stream to one output file), and no global
  single-partition sort ever happens.

Determinism: md5 hex strings and integer arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

CHUNK_W = 120  # window chars
CHUNK_S = 90  # stride chars (W - S = 30 chars overlap)
N_SHARDS = 8


@register_query(
    "text_chunk_overlap",
    oracle=f"""
SELECT doc_id,
       CAST(u.i AS INT) AS chunk_idx,
       CAST(u.i * {CHUNK_S} AS BIGINT) AS chunk_off,
       CAST(length(substring(text, CAST(u.i * {CHUNK_S} + 1 AS INT), {CHUNK_W})) AS BIGINT) AS chunk_len,
       md5(substring(text, CAST(u.i * {CHUNK_S} + 1 AS INT), {CHUNK_W})) AS chunk_md5
FROM documents,
     UNNEST(range(0, CAST((greatest(length(text), 1) - 1) // {CHUNK_S} AS BIGINT) + 1)) AS u(i)
ORDER BY doc_id, chunk_idx
""",
)
def text_chunk_overlap(spark, sf_dir):
    """Overlapping retrieval chunks: windows of CHUNK_W chars every
    CHUNK_S chars (last window may run short; every document yields at
    least one chunk). Chunk text is reported as md5 so the result stays
    row-shaped for the driver's canonicalizer; offsets are 0-based.

    Plan: scan → sequence/explode → substring/md5 — map-only, no
    shuffle; Catalyst prunes to (doc_id, text) at the parquet scan."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    n_chunks = (
        (F.greatest(F.length("text"), F.lit(1)) - 1) / CHUNK_S
    ).cast("bigint") + 1
    sub = F.expr(
        f"substring(text, CAST(chunk_idx * {CHUNK_S} + 1 AS INT), {CHUNK_W})"
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
                "chunk_idx_raw"
            ),
        )
        .withColumn("chunk_idx", F.col("chunk_idx_raw").cast("int"))
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx").cast("bigint") * CHUNK_S).alias("chunk_off"),
            F.length(sub).cast("bigint").alias("chunk_len"),
            F.md5(sub).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register_query(
    "pipeline_epoch_shuffle",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         md5(concat('ep1:', CAST(doc_id AS VARCHAR))) AS skey
  FROM documents
), s AS (
  SELECT doc_id, skey,
         CAST(('0x' || substring(skey, 1, 12))::BIGINT % {N_SHARDS} AS INT) AS shard
  FROM k
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY skey) AS BIGINT) AS pos
FROM s
ORDER BY shard, pos
""",
)
def pipeline_epoch_shuffle(spark, sf_dir):
    """Deterministic global shuffle into N_SHARDS training shards for an
    epoch: key = md5('ep1:' ‖ doc_id), shard = key's leading 48 bits mod
    N_SHARDS, pos = rank within the shard by key. Re-keying the salt
    ('ep2:', …) gives an independent permutation per epoch with no RNG
    state to coordinate.

    Plan: map (md5 + conv) → single hash exchange on shard → per-shard
    sort for row_number. No global ordering bottleneck: each shard sorts
    independently, which is the order a shard writer needs."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string"))).alias(
            "skey"
        ),
    ).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("skey", 1, 12), 16, 10).cast("bigint"),
            F.lit(N_SHARDS),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("skey")
    return (
        keyed.select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
        .orderBy("shard", "pos")
    )

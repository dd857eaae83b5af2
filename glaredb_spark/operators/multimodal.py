"""Multimodal column handling — binary payloads with typed metadata.

North-star surface (BASELINE.json): image/audio/video as opaque BINARY
columns plus a typed metadata struct, with decode / feature-extract /
resize / frame-sample stages as Arrow-batched ``mapInPandas`` pipelines.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (bytes → summed-byte "pixel" statistics)
exercises the real Spark plumbing — schema handling, Arrow batch shapes,
partition-parallel execution — which is what the tests verify.

Scale notes: binary payloads ride in parquet pages like any column; decode
fan-out is a map-only stage (no shuffle); ``spark.sql.files.maxPartitionBytes``
bounds per-task memory. Metadata-only queries (the oracle-checked one below)
never touch payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload BINARY, meta STRUCT) — the multimodal
    column convention: opaque bytes + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/fake-image").alias("mime"),
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payload bytes into pixel statistics + a feature vector.

    Real decoders (PIL/ffmpeg) are not available in this container — the
    Spark-side contract (mapInPandas over Arrow batches, explicit output
    schema) is real; the byte-level decode is a deterministic fake.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [int(m["width"]) for m in pdf["meta"]],
                    "height": [int(m["height"]) for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mean_byte": [
                        (sum(p) / len(p)) if len(p) else 0.0 for p in pdf["payload"]
                    ],
                    "features": [
                        [float(sum(p[i::8])) for i in range(8)] for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def resize(decoded: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub — plumbing only (metadata transform, payload untouched)."""
    return decoded.withColumn("width", F.lit(width).cast("int")).withColumn(
        "height", F.lit(height).cast("int")
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub for video payloads: keep every n-th row —
    partition-local filter, no shuffle."""
    return media.filter(F.col("doc_id") % every_n == 0)


# ---------------------------------------------------------------------------
# oracle-checked metadata path (payload-pruned scan + binary functions)
# ---------------------------------------------------------------------------
@register_query(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       md5(text) AS payload_md5,
       CAST(n_chars AS BIGINT) AS width,
       source AS origin
FROM documents
ORDER BY doc_id
""",
)
def multimodal_binary_meta(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = as_media_table(docs)
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.origin").alias("origin"),
    ).orderBy("doc_id")

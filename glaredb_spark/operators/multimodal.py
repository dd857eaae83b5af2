"""Multimodal column handling — binary payloads with typed metadata.

North-star surface (BASELINE.json): image/audio/video as opaque BINARY
columns plus a typed metadata struct, with decode / feature-extract /
resize / frame-sample stages as Arrow-batched ``mapInPandas`` pipelines.

The decode step is REAL for BMP (24-bit BI_RGB) and PPM (P6) via the
pure-Python codecs in glaredb_spark.functions.imagecodec — no native
libraries needed; payloads in other formats (PNG/JPEG) raise
NotImplementedError naming the gap. ``fake=True`` keeps the r1
deterministic byte-statistics decoder for non-image payloads (it exercises
the same Spark plumbing over arbitrary bytes). The registered
``multimodal_decode_bmp`` query round-trips deterministic generated BMPs
through encode→decode and is ORACLE-GATED: the pixel pattern is a closed
form of doc_id, so DuckDB computes the expected statistics arithmetically.

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
from glaredb_spark.sources.files import load_wide

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

    Real path (default): BMP/PPM payloads decoded by
    glaredb_spark.functions.imagecodec (pure Python + numpy) inside
    Arrow-batched mapInPandas; width/height come from the image header,
    mean_byte is the mean over all RGB samples, features is an 8-bin
    luminance histogram (float fractions, deterministic). Other formats
    raise NotImplementedError naming the missing codec.

    fake=True: the r1 byte-statistics decoder for arbitrary (non-image)
    payloads — same plumbing, no image semantics.
    """

    def _decode_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
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

    def _decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from glaredb_spark.functions.imagecodec import sniff_decode

        for pdf in batches:
            widths, heights, means, feats = [], [], [], []
            for payload in pdf["payload"]:
                px = sniff_decode(bytes(payload))
                h, w, _ = px.shape
                widths.append(w)
                heights.append(h)
                means.append(float(px.mean()))
                # 8-bin luminance histogram as fractions (Rec.601 luma)
                luma = (
                    0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
                )
                hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
                feats.append((hist / luma.size).astype("float32").tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": widths,
                    "height": heights,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mean_byte": means,
                    "features": feats,
                }
            )

    return media.mapInPandas(_decode_fake if fake else _decode_real, DECODED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_abs", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Real PCM16 WAV decode (functions/audiocodec.py) — sample statistics
    per payload. Same Arrow-batched mapInPandas shape as decode_image."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        from glaredb_spark.functions.audiocodec import decode_wav

        for pdf in batches:
            rates, chans, counts, means, rmss = [], [], [], [], []
            for payload in pdf["payload"]:
                rate, ch, samples = decode_wav(bytes(payload))
                flat = samples.astype(np.int64).ravel()
                rates.append(rate)
                chans.append(ch)
                counts.append(len(flat))
                # integer sums -> double division -> sqrt: deterministic
                means.append(float(np.abs(flat).sum()) / len(flat))
                rmss.append(math.sqrt(float((flat * flat).sum()) / len(flat)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rates,
                    "n_channels": chans,
                    "n_samples": counts,
                    "mean_abs": means,
                    "rms": rmss,
                }
            )

    return media.mapInPandas(_decode, AUDIO_SCHEMA)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("major_brand", T.StringType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("duration_seconds", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def video_meta(media: DataFrame) -> DataFrame:
    """Real MP4 container-metadata extraction (functions/videometa.py) —
    duration/timescale/track dimensions from the box tree; frame decode
    stays gated on native codecs."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from glaredb_spark.functions.videometa import parse_mp4_meta

        for pdf in batches:
            metas = [parse_mp4_meta(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "major_brand": [m["major_brand"] for m in metas],
                    "timescale": [m["timescale"] for m in metas],
                    "duration_seconds": [m["duration_seconds"] for m in metas],
                    "width": [m.get("width") for m in metas],
                    "height": [m.get("height") for m in metas],
                }
            )

    return media.mapInPandas(_parse, VIDEO_META_SCHEMA)


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real nearest-neighbor resize: decode payload, resize the pixel array,
    re-encode as BMP. Map-only stage (no shuffle); payload column is
    replaced, metadata width/height updated."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from glaredb_spark.functions.imagecodec import (
            encode_bmp,
            resize_nearest,
            sniff_decode,
        )

        for pdf in batches:
            payloads = [
                encode_bmp(resize_nearest(sniff_decode(bytes(p)), width, height))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(_resize, out_schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """ROW-level sampling (every n-th media row) — partition-local filter,
    no shuffle. For frame-level sampling inside one video see
    ``video_frame_samples``."""
    return media.filter(F.col("doc_id") % every_n == 0)


def video_frame_samples(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Every n-th FRAME of each MP4 payload via the real sample table
    (stts/stsc/stsz/stco — functions/videometa.parse_mp4_samples): one row
    per kept sample with its byte offset/size/dts — exactly the records a
    codec needs to seek-read frames without scanning the mdat. Map-only
    (no shuffle); frame decode itself needs native codecs and raises by
    name upstream."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_idx", T.LongType()),
            T.StructField("byte_offset", T.LongType()),
            T.StructField("sample_bytes", T.LongType()),
            T.StructField("dts_seconds", T.DoubleType()),
        ]
    )

    def _samples(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from glaredb_spark.functions.videometa import parse_mp4_samples

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "sample_idx", "byte_offset",
                                    "sample_bytes", "dts_seconds")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for s in parse_mp4_samples(bytes(payload)):
                    if s["idx"] % every_n:
                        continue
                    rows["doc_id"].append(int(doc_id))
                    rows["sample_idx"].append(s["idx"])
                    rows["byte_offset"].append(s["offset"])
                    rows["sample_bytes"].append(s["size"])
                    rows["dts_seconds"].append(s["dts_seconds"])
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(_samples, out_schema)


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
    docs = load_wide(spark, sf_dir, "documents")
    media = as_media_table(docs)
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.origin").alias("origin"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# oracle-checked REAL decode: deterministic generated BMPs round-trip
# encode→decode; pixel value i of doc d is (d*31 + i*7) % 256, so DuckDB
# computes the expected statistics in closed form — the decoder's output is
# hash-gated against arithmetic ground truth, not just "ran without error".
# ---------------------------------------------------------------------------
_BMP_W, _BMP_H = 16, 8
_BMP_SAMPLES = _BMP_W * _BMP_H * 3  # 384 RGB samples
_BMP_BYTES = 54 + _BMP_H * ((_BMP_W * 3 + 3) & ~3)  # header + padded rows


@register_query(
    "multimodal_decode_bmp",
    oracle=f"""
SELECT d.doc_id,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       CAST({_BMP_BYTES} AS BIGINT) AS n_bytes,
       (SELECT CAST(SUM((d.doc_id * 31 + i.g * 7) % 256) AS DOUBLE) / {_BMP_SAMPLES}
        FROM range(0, {_BMP_SAMPLES}) i(g)) AS mean_byte
FROM documents d
ORDER BY d.doc_id
""",
)
def multimodal_decode_bmp(spark, sf_dir):
    docs = load_wide(spark, sf_dir, "documents").select("doc_id")
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from glaredb_spark.functions.imagecodec import encode_bmp

        idx = np.arange(_BMP_SAMPLES, dtype=np.int64)
        for pdf in batches:
            payloads = [
                encode_bmp(
                    ((int(d) * 31 + idx * 7) % 256)
                    .astype(np.uint8)
                    .reshape(_BMP_H, _BMP_W, 3)
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(_gen, gen_schema)
    return (
        decode_image(media)
        .select("doc_id", "width", "height", "n_bytes", "mean_byte")
        .orderBy("doc_id")
    )


_WAV_N = 256  # samples per generated clip
_WAV_RATE = 8000


@register_query(
    "multimodal_decode_wav",
    oracle=f"""
SELECT d.doc_id,
       CAST({_WAV_RATE} AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST({_WAV_N} AS BIGINT) AS n_samples,
       (SELECT CAST(SUM(ABS((d.doc_id * 37 + i.g * 11) % 4096 - 2048)) AS DOUBLE)
          / {_WAV_N} FROM range(0, {_WAV_N}) i(g)) AS mean_abs,
       (SELECT sqrt(CAST(SUM(((d.doc_id * 37 + i.g * 11) % 4096 - 2048)
                          * ((d.doc_id * 37 + i.g * 11) % 4096 - 2048)) AS DOUBLE)
          / {_WAV_N}) FROM range(0, {_WAV_N}) i(g)) AS rms
FROM documents d
ORDER BY d.doc_id
""",
)
def multimodal_decode_wav(spark, sf_dir):
    """REAL WAV decode, arithmetic-oracle-gated like multimodal_decode_bmp:
    sample i of doc d is (d*37 + i*11) % 4096 - 2048, so DuckDB computes the
    expected mean-abs and RMS in closed form."""
    docs = load_wide(spark, sf_dir, "documents").select("doc_id")
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from glaredb_spark.functions.audiocodec import encode_wav

        idx = np.arange(_WAV_N, dtype=np.int64)
        for pdf in batches:
            payloads = [
                encode_wav(
                    ((int(d) * 37 + idx * 11) % 4096 - 2048).astype(np.int16),
                    _WAV_RATE,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(_gen, gen_schema)
    return decode_audio(media).orderBy("doc_id")


_VID_TS = 600


@register_query(
    "multimodal_video_meta",
    oracle=f"""
SELECT d.doc_id,
       'isom' AS major_brand,
       CAST({_VID_TS} AS INT) AS timescale,
       CAST(d.doc_id % 300 + 30 AS DOUBLE) AS duration_seconds,
       CAST(320 + (d.doc_id % 4) * 160 AS INT) AS width,
       CAST(180 + (d.doc_id % 4) * 90 AS INT) AS height
FROM documents d
ORDER BY d.doc_id
""",
)
def multimodal_video_meta(spark, sf_dir):
    """REAL MP4 box-tree parsing, arithmetic-oracle-gated: each generated
    container's duration/dimensions are closed forms of doc_id, so DuckDB
    computes the expected parse results directly."""
    docs = load_wide(spark, sf_dir, "documents").select("doc_id")
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from glaredb_spark.functions.videometa import build_minimal_mp4

        for pdf in batches:
            payloads = [
                build_minimal_mp4(
                    duration=(int(d) % 300 + 30) * _VID_TS,
                    timescale=_VID_TS,
                    width=320 + (int(d) % 4) * 160,
                    height=180 + (int(d) % 4) * 90,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(_gen, gen_schema)
    return video_meta(media).orderBy("doc_id")


_FS_N = 2  # keep every 2nd frame
_O_NFRAMES = "(d.doc_id % 5 + 4)"
_O_SIZE = "(100 + ((d.doc_id + r.i) % 7) * 10)"


@register_query(
    "multimodal_frame_sample",
    oracle=f"""
WITH frames AS (
  SELECT d.doc_id, r.i AS sample_idx, {_O_SIZE} AS sz
  FROM documents d, UNNEST(range({_O_NFRAMES})) r(i)),
placed AS (
  SELECT doc_id, sample_idx, sz,
         36 + COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY sample_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM frames)
SELECT doc_id, CAST(sample_idx AS BIGINT) AS sample_idx,
       CAST(off AS BIGINT) AS byte_offset,
       CAST(sz AS BIGINT) AS sample_bytes,
       CAST(sample_idx * 100 AS DOUBLE) / 600 AS dts_seconds
FROM placed WHERE sample_idx % {_FS_N} = 0
ORDER BY doc_id, sample_idx
""",
)
def multimodal_frame_sample(spark, sf_dir):
    """REAL MP4 sample-table resolution (stts/stsc/stsz/stco), arithmetic-
    oracle-gated: generated containers carry closed-form per-frame sizes,
    so DuckDB reproduces offsets/sizes/timestamps with a window sum while
    Spark actually parses the binary box tree."""
    docs = load_wide(spark, sf_dir, "documents").select("doc_id")
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from glaredb_spark.functions.videometa import build_mp4_with_samples

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = d % 5 + 4
                sizes = [100 + ((d + i) % 7) * 10 for i in range(n)]
                payloads.append(
                    build_mp4_with_samples(
                        duration=n * 100,
                        sample_sizes=sizes,
                        sample_delta=100,
                        timescale=600,
                        width=320,
                        height=180,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(_gen, gen_schema)
    return video_frame_samples(media, every_n=_FS_N).orderBy(
        "doc_id", "sample_idx"
    )


_PNG_W, _PNG_H = 12, 6
_PNG_SAMPLES = _PNG_W * _PNG_H * 3


@register_query(
    "multimodal_decode_png",
    oracle=f"""
SELECT d.doc_id,
       CAST({_PNG_W} AS INT) AS width,
       CAST({_PNG_H} AS INT) AS height,
       (SELECT CAST(SUM((d.doc_id * 37 + i.g * 11) % 256) AS DOUBLE) / {_PNG_SAMPLES}
        FROM range(0, {_PNG_SAMPLES}) i(g)) AS mean_byte
FROM documents d
ORDER BY d.doc_id
""",
)
def multimodal_decode_png(spark, sf_dir):
    """Real PNG decode (functions/imagecodec.py decode_png: zlib IDAT +
    scanline unfilter) hash-gated against closed-form pixel arithmetic —
    the same contract as multimodal_decode_bmp, over the compressed
    format. n_bytes is format-dependent (zlib stream) and excluded from
    the oracle columns."""
    docs = load_wide(spark, sf_dir, "documents").select("doc_id")
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from glaredb_spark.functions.imagecodec import encode_png

        idx = np.arange(_PNG_SAMPLES, dtype=np.int64)
        for pdf in batches:
            payloads = [
                encode_png(
                    ((int(d) * 37 + idx * 11) % 256)
                    .astype(np.uint8)
                    .reshape(_PNG_H, _PNG_W, 3)
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(_gen, gen_schema)
    return (
        decode_image(media)
        .select("doc_id", "width", "height", "mean_byte")
        .orderBy("doc_id")
    )


_JPG_W, _JPG_H = 16, 16


@register_query(
    "multimodal_decode_jpeg",
    oracle=f"""
SELECT doc_id,
       CAST({_JPG_W} AS INT) AS width,
       CAST({_JPG_H} AS INT) AS height,
       CAST(128 + 2 * (doc_id % 50) AS DOUBLE) AS mean_byte
FROM documents
ORDER BY doc_id
""",
)
def multimodal_decode_jpeg(spark, sf_dir):
    """Real baseline-JPEG decode (functions/jpegcodec.py: Huffman entropy
    decode, dequant, exact IDCT, YCbCr→RGB). Payloads are uniform-gray
    images whose level is a multiple of 2 above 128 — the DC coefficient
    quantizes EXACTLY (8·Δ/16 integral), so the lossy codec reproduces
    the input bit-for-bit and the oracle states the mean in closed form."""
    docs = load_wide(spark, sf_dir, "documents").select("doc_id")
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from glaredb_spark.functions.jpegcodec import encode_jpeg

        for pdf in batches:
            payloads = [
                encode_jpeg(
                    np.full(
                        (_JPG_H, _JPG_W, 3),
                        128 + 2 * (int(d) % 50),
                        dtype=np.uint8,
                    )
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(_gen, gen_schema)
    return (
        decode_image(media)
        .select("doc_id", "width", "height", "mean_byte")
        .orderBy("doc_id")
    )

"""Multimodal plumbing: binary columns, metadata structs, mapInPandas
decode pipeline (deterministic fake decoder), resize/frame-sample stubs."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    from glaredb_spark.operators.multimodal import as_media_table
    from glaredb_spark.sources.files import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return as_media_table(docs)


def test_media_schema(media):
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<")


def test_decode_requires_explicit_fake(media):
    from glaredb_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(media)


def test_fake_decode_pipeline(media):
    from glaredb_spark.operators.multimodal import decode_image, resize

    decoded = decode_image(media, fake=True)
    assert dict(decoded.dtypes)["features"] == "array<float>"
    rows = decoded.orderBy("doc_id").limit(5).collect()
    assert all(len(r.features) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic: running twice gives identical output
    again = decode_image(media, fake=True).orderBy("doc_id").limit(5).collect()
    assert [r.mean_byte for r in rows] == [r.mean_byte for r in again]
    resized = resize(decoded, 32, 32)
    r = resized.limit(1).collect()[0]
    assert (r.width, r.height) == (32, 32)


def test_frame_sample(media):
    from glaredb_spark.operators.multimodal import frame_sample

    total = media.count()
    kept = frame_sample(media, every_n=10).count()
    assert 0 < kept < total


def test_payload_pruned_scan(spark, sf_dir):
    """Metadata-only query must not read the payload source column."""
    from glaredb_spark.registry import QUERIES, load_all
    from glaredb_spark.plans import read_schema_columns

    load_all()
    df = QUERIES["multimodal_binary_meta"](spark, sf_dir)
    cols = read_schema_columns(df)
    assert "text" in cols  # payload is derived from text here
    assert "lang" not in cols  # untouched columns pruned

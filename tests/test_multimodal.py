"""Multimodal plumbing: binary columns, metadata structs, REAL BMP/PPM
decode via mapInPandas (pure-python codecs), nearest-neighbor resize,
frame-sample."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    from glaredb_spark.operators.multimodal import as_media_table
    from glaredb_spark.sources.files import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return as_media_table(docs)


def _gradient(h, w, seed):
    i = np.arange(h * w * 3, dtype=np.int64)
    return ((seed * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)


@pytest.fixture(scope="module")
def bmp_media(spark):
    from glaredb_spark.functions.imagecodec import encode_bmp, encode_ppm

    rows = [
        (0, bytearray(encode_bmp(_gradient(8, 16, 0)))),
        (1, bytearray(encode_bmp(_gradient(8, 16, 1)))),
        (2, bytearray(encode_ppm(_gradient(4, 4, 2)))),  # mixed formats
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_media_schema(media):
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<")


def test_codec_roundtrip_exact():
    from glaredb_spark.functions.imagecodec import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        resize_nearest,
    )

    px = _gradient(5, 7, 3)  # odd width exercises BMP row padding
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    small = resize_nearest(px, 3, 2)
    assert small.shape == (2, 3, 3)
    assert np.array_equal(small[0, 0], px[0, 0])  # corner preserved


def test_codec_rejects_garbage():
    from glaredb_spark.functions.imagecodec import decode_bmp, sniff_decode

    with pytest.raises(ValueError, match="BM"):
        decode_bmp(b"\x89PNG....")
    # PNG is now decoded for real — a bare magic with no chunks is a
    # malformed file, not an unsupported format
    with pytest.raises(ValueError, match="IHDR"):
        sniff_decode(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError, match="no pure-python decoder"):
        sniff_decode(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(ValueError, match="truncated"):
        from glaredb_spark.functions.imagecodec import encode_bmp

        decode_bmp(encode_bmp(_gradient(4, 4, 0))[:-10])


def test_real_decode_pipeline(spark, bmp_media):
    from glaredb_spark.operators.multimodal import decode_image

    rows = {r.doc_id: r for r in decode_image(bmp_media).collect()}
    assert (rows[0].width, rows[0].height) == (16, 8)
    assert (rows[2].width, rows[2].height) == (4, 4)
    expected_mean = float(_gradient(8, 16, 1).mean())
    assert rows[1].mean_byte == expected_mean
    assert len(rows[0].features) == 8
    assert abs(sum(rows[0].features) - 1.0) < 1e-6  # histogram fractions


def test_real_decode_unknown_format_raises(spark):
    from glaredb_spark.operators.multimodal import decode_image

    webp = spark.createDataFrame(
        [(0, bytearray(b"RIFF\x00\x00\x00\x00WEBPVP8 xxxx"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="no pure-python decoder"):
        decode_image(webp).collect()


def test_resize_real(spark, bmp_media):
    from glaredb_spark.operators.multimodal import decode_image, resize

    resized = resize(bmp_media.filter(F.col("doc_id") < 2), 4, 4)
    out = {r.doc_id: r for r in decode_image(resized).collect()}
    assert all((r.width, r.height) == (4, 4) for r in out.values())
    # nearest-neighbor: top-left pixel survives the downscale
    src = _gradient(8, 16, 0)
    from glaredb_spark.functions.imagecodec import decode_bmp

    first_payload = {
        r.doc_id: bytes(r.payload)
        for r in resize(bmp_media.filter(F.col("doc_id") < 2), 4, 4).collect()
    }[0]
    assert np.array_equal(decode_bmp(first_payload)[0, 0], src[0, 0])


def test_fake_decode_pipeline(media):
    from glaredb_spark.operators.multimodal import decode_image

    decoded = decode_image(media, fake=True)
    assert dict(decoded.dtypes)["features"] == "array<float>"
    rows = decoded.orderBy("doc_id").limit(5).collect()
    assert all(len(r.features) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic: running twice gives identical output
    again = decode_image(media, fake=True).orderBy("doc_id").limit(5).collect()
    assert [r.mean_byte for r in rows] == [r.mean_byte for r in again]


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


def test_wav_codec_roundtrip_and_chunks():
    from glaredb_spark.functions.audiocodec import decode_wav, encode_wav

    s = np.arange(-100, 100, dtype=np.int16)
    rate, ch, back = decode_wav(encode_wav(s, 44100))
    assert (rate, ch) == (44100, 1)
    assert np.array_equal(back.ravel(), s)
    # stereo
    st = np.stack([s, -s], axis=1).astype(np.int16)
    rate, ch, back = decode_wav(encode_wav(st, 16000))
    assert (rate, ch) == (16000, 2) and np.array_equal(back, st)
    # extra RIFF chunk before data must be skipped
    raw = encode_wav(s, 8000)
    extra = raw[:12] + b"LIST\x04\x00\x00\x00INFO" + raw[12:]
    patched = bytearray(extra)
    patched[4:8] = (len(extra) - 8).to_bytes(4, "little")
    rate, ch, back = decode_wav(bytes(patched))
    assert np.array_equal(back.ravel(), s)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x03garbage")
    with pytest.raises(ValueError, match="PCM16"):
        # 8-bit format field
        bad = bytearray(raw)
        bad[34:36] = (8).to_bytes(2, "little")
        decode_wav(bytes(bad))


def test_decode_audio_pipeline(spark):
    from glaredb_spark.functions.audiocodec import encode_wav
    from glaredb_spark.operators.multimodal import decode_audio

    s = np.array([3, -4, 0, 5], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 8000)))], "doc_id long, payload binary"
    )
    r = decode_audio(df).collect()[0]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, 4)
    assert r.mean_abs == 3.0  # (3+4+0+5)/4
    assert r.rms == (50 / 4) ** 0.5  # sqrt((9+16+0+25)/4)


def test_mp4_meta_walker():
    from glaredb_spark.functions.videometa import build_minimal_mp4, parse_mp4_meta

    m = parse_mp4_meta(build_minimal_mp4(duration=45 * 600, width=1920, height=1080))
    assert m["duration_seconds"] == 45.0
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["major_brand"] == "isom"
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_meta(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="truncated"):
        parse_mp4_meta(build_minimal_mp4(600)[:-20])


def test_png_codec_roundtrip_and_filters():
    """decode_png survives every scanline filter type and color modes."""
    import struct
    import zlib

    import numpy as np

    from glaredb_spark.functions.imagecodec import (
        decode_png,
        encode_png,
        sniff_decode,
    )

    px = (np.arange(16 * 8 * 3) % 256).astype(np.uint8).reshape(8, 16, 3)
    assert np.array_equal(decode_png(encode_png(px)), px)
    assert np.array_equal(sniff_decode(encode_png(px)), px)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # grayscale (color 0) broadcasts to RGB
    h, w = 3, 5
    gray = (np.arange(h * w) % 256).astype(np.uint8).reshape(h, w)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out[:, :, 0], gray)

    # palette (color 3)
    plte = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idxs = np.array([[0, 1, 0], [1, 0, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idxs[y].tobytes() for y in range(2))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert np.array_equal(out, plte[idxs])


def test_g711_wav_decode():
    """ITU G.711 mu-law / A-law WAV expansion (format codes 7/6)."""
    import numpy as np

    from glaredb_spark.functions.audiocodec import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_wav,
        encode_ulaw_wav,
    )

    # standard reference points
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x00] == -32124
    assert _ALAW_TABLE[0xD5] == 8 and _ALAW_TABLE[0x55] == -8
    vals = _ULAW_TABLE[np.arange(256)].copy()
    rate, ch, out = decode_wav(encode_ulaw_wav(vals, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], vals)


def test_gif_codec_roundtrip():
    import numpy as np

    from glaredb_spark.functions.imagecodec import (
        decode_gif,
        encode_gif,
        sniff_decode,
    )

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (20, 3), dtype=np.uint8)
    px = pal[rng.randint(0, 20, (13, 17))]
    assert np.array_equal(decode_gif(encode_gif(px)), px)
    assert np.array_equal(sniff_decode(encode_gif(px)), px)
    # multi-clear-cycle stream
    big = pal[rng.randint(0, 20, (64, 64))]
    assert np.array_equal(decode_gif(encode_gif(big)), big)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"BM123456")


def test_jpeg_codec_bounds():
    """Baseline JPEG: exact on uniform blocks, bounded error on smooth
    gradients (lossy codec contract)."""
    import numpy as np

    from glaredb_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    img = np.full((16, 24, 3), 128, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)
    yy, xx = np.mgrid[0:32, 0:48]
    grad = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(grad))
    err = np.abs(dec.astype(int) - grad.astype(int))
    assert err.mean() < 4 and err.max() < 40
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a..")
    # sniff path picks it up
    from glaredb_spark.functions.imagecodec import sniff_decode

    assert np.array_equal(sniff_decode(encode_jpeg(img)), img)

"""Pure-Python WAV (RIFF PCM16) codec — real audio decode with no native
dependencies, the audio sibling of functions/imagecodec.py.

Backs operators/multimodal.decode_audio: executors parse RIFF headers and
PCM16 sample data with struct + numpy inside Arrow-batched mapInPandas.
Compressed formats (MP3/AAC/OGG) need native codecs absent from this
environment and raise NotImplementedError naming the gap.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — as PCM16 WAV."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM16 WAV to (sample_rate, channels, samples (n, ch) int16).
    Walks RIFF chunks, so extra chunks (LIST/INFO) before 'data' are fine."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if not (
                (audio_fmt == 1 and bits == 16)
                or (audio_fmt in (6, 7) and bits == 8)
            ):
                raise ValueError(
                    f"unsupported WAV: format={audio_fmt} bits={bits} "
                    "(PCM16 + G.711 A-law/mu-law; MP3/AAC need native codecs)"
                )
            fmt = (audio_fmt, ch, rate)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    audio_fmt, ch, rate = fmt
    if audio_fmt == 1:
        samples = np.frombuffer(pcm, "<i2", len(pcm) // 2)
    elif audio_fmt == 7:  # G.711 mu-law (ITU-T closed form)
        samples = _ULAW_TABLE[np.frombuffer(pcm, np.uint8)]
    else:  # G.711 A-law
        samples = _ALAW_TABLE[np.frombuffer(pcm, np.uint8)]
    return rate, ch, samples.reshape(-1, ch)


def _build_ulaw_table() -> np.ndarray:
    """ITU-T G.711 mu-law byte → linear PCM16 expansion table."""
    out = np.zeros(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = ((mant << 3) + 0x84) << exp
        mag -= 0x84
        out[b] = -mag if sign else mag
    return out


def _build_alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law byte → linear PCM16 expansion table."""
    out = np.zeros(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        if exp:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        else:
            mag = (mant << 4) + 8
        # A-law transmits sign bit 1 for POSITIVE (opposite of mu-law)
        out[b] = mag if sign else -mag
    return out


_ULAW_TABLE = _build_ulaw_table()
_ALAW_TABLE = _build_alaw_table()


def encode_ulaw_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a G.711 mu-law WAV (format 7) — the
    inverse of the expansion table, for round-trip tests."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_ulaw_wav expects int16 mono")
    # compress: find for each sample the closest table byte (exact for
    # values produced by the expansion table)
    order = np.argsort(_ULAW_TABLE)
    idx = np.searchsorted(_ULAW_TABLE[order], samples)
    idx = np.clip(idx, 0, 255)
    lower = np.clip(idx - 1, 0, 255)
    pick_lower = np.abs(
        _ULAW_TABLE[order[lower]].astype(np.int32) - samples
    ) <= np.abs(_ULAW_TABLE[order[np.clip(idx, 0, 255)]].astype(np.int32) - samples)
    best = np.where(pick_lower, order[lower], order[np.clip(idx, 0, 255)])
    data = best.astype(np.uint8).tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 7, 1, sample_rate, sample_rate, 1, 8
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data

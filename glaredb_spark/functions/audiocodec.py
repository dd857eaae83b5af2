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
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format={audio_fmt} bits={bits} "
                    "(only PCM16; MP3/AAC need native codecs)"
                )
            fmt = (ch, rate)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    ch, rate = fmt
    samples = np.frombuffer(pcm, "<i2", len(pcm) // 2)
    return rate, ch, samples.reshape(-1, ch)

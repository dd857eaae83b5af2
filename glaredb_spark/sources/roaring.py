"""Roaring bitmap codec for Delta deletion vectors — from scratch.

Implements the PUBLIC serialization formats the Delta Lake protocol uses
for deletion vectors (delta.io PROTOCOL.md "Deletion Vectors" +
RoaringFormatSpec at github.com/RoaringBitmap/RoaringFormatSpec):

- the standard 32-bit roaring container serialization (array / bitmap /
  run containers, SERIAL_COOKIE 12347 with run support or
  SERIAL_COOKIE_NO_RUNCONTAINER 12346),
- the 64-bit "portable" RoaringBitmapArray wrapper Delta serializes
  (i64 LE bucket count, then per bucket an i32 LE high-32 key + one
  32-bit bitmap),
- Delta's DV blob framing (i32 LE magic 1681511377 + portable array;
  file storage wraps it as [i32 BE size][blob][i32 BE CRC-32 of blob]
  after a 1-byte format version at file start),
- Z85 decoding (the ZeroMQ base85 alphabet — NOT python's b85) for the
  'u'/'i' storageType payloads.

Pure numpy; both directions are implemented so tests pin the byte
layout against hand-computed vectors and round-trips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SERIAL_COOKIE = 12347
SERIAL_COOKIE_NO_RUNCONTAINER = 12346
NO_OFFSET_THRESHOLD = 4
DV_MAGIC = 1681511377

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class RoaringError(ValueError):
    pass


def z85_decode(text: str) -> bytes:
    """ZeroMQ Z85: 5 chars -> 4 bytes big-endian base-85."""
    if len(text) % 5:
        raise RoaringError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise RoaringError(f"invalid z85 character {ch!r}") from None
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise RoaringError(f"z85 data length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


# -- 32-bit roaring ----------------------------------------------------------


def _decode_rbm32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one standard 32-bit roaring bitmap at ``pos``; returns
    (sorted uint32 values, new position)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        pos += 4
        run_bits = buf[pos : pos + (size + 7) // 8]
        pos += (size + 7) // 8
        has_offsets = size >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_bits = b""
        has_offsets = True
    else:
        raise RoaringError(f"bad roaring cookie {cookie}")

    def is_run(i: int) -> bool:
        return bool(run_bits) and bool(run_bits[i // 8] & (1 << (i % 8)))

    headers = []
    for i in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        headers.append((key, card_m1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * size  # offsets are a seek aid; containers are in order
    parts = []
    for i, (key, card) in enumerate(headers):
        base = np.uint32(key) << np.uint32(16)
        if is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).astype(np.uint32)
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(runs[2 * j], runs[2 * j] + runs[2 * j + 1] + 1,
                              dtype=np.uint32)
                    for j in range(n_runs)
                ]
            ) if n_runs else np.empty(0, np.uint32)
        elif card <= 4096:
            vals = np.frombuffer(
                buf, dtype="<u2", count=card, offset=pos
            ).astype(np.uint32)
            pos += 2 * card
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
        parts.append(base | vals)
    return (
        np.concatenate(parts) if parts else np.empty(0, np.uint32),
        pos,
    )


def _encode_rbm32(values: np.ndarray) -> bytes:
    """Encode sorted uint32 values as a standard 32-bit roaring bitmap
    (array containers for card<=4096, bitmap containers above — the
    encoder never emits run containers, which is valid)."""
    values = np.asarray(values, dtype=np.uint32)
    keys = (values >> np.uint32(16)).astype(np.uint16)
    lows = (values & np.uint32(0xFFFF)).astype(np.uint16)
    uniq, starts = np.unique(keys, return_index=True)
    groups = np.split(lows, starts[1:])
    size = len(uniq)
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUNCONTAINER, size)
    for key, g in zip(uniq, groups):
        out += struct.pack("<HH", int(key), len(g) - 1)
    # offsets (always present for the no-run cookie)
    container_bytes = []
    for g in groups:
        if len(g) <= 4096:
            container_bytes.append(g.astype("<u2").tobytes())
        else:
            words = np.zeros(1024, dtype="<u8")
            bits = np.zeros(65536, dtype=np.uint8)
            bits[g] = 1
            words = np.packbits(bits, bitorder="little").view("<u8")
            container_bytes.append(words.tobytes())
    offset = len(out) + 4 * size
    for cb in container_bytes:
        out += struct.pack("<I", offset)
        offset += len(cb)
    for cb in container_bytes:
        out += cb
    return bytes(out)


# -- 64-bit portable wrapper -------------------------------------------------


def decode_portable64(buf: bytes, pos: int = 0) -> np.ndarray:
    """Portable RoaringBitmapArray -> sorted int64 positions."""
    (n_maps,) = struct.unpack_from("<q", buf, pos)
    pos += 8
    parts = []
    for _ in range(n_maps):
        (high,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        vals32, pos = _decode_rbm32(buf, pos)
        parts.append((np.int64(high) << np.int64(32)) | vals32.astype(np.int64))
    return (
        np.concatenate(parts) if parts else np.empty(0, np.int64)
    )


def encode_portable64(positions) -> bytes:
    positions = np.asarray(sorted(set(int(p) for p in positions)), np.int64)
    highs = (positions >> np.int64(32)).astype(np.int32)
    lows = (positions & np.int64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    groups = np.split(lows, starts[1:])
    out = bytearray(struct.pack("<q", len(uniq)))
    for high, g in zip(uniq, groups):
        out += struct.pack("<i", int(high))
        out += _encode_rbm32(g)
    return bytes(out)


# -- Delta DV blob framing ---------------------------------------------------


def decode_dv_blob(data: bytes) -> np.ndarray:
    """Magic-prefixed DV payload (the `sizeInBytes` bytes) -> positions."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise RoaringError(f"bad deletion vector magic {magic}")
    return decode_portable64(data, 4)


def encode_dv_blob(positions) -> bytes:
    return struct.pack("<i", DV_MAGIC) + encode_portable64(positions)


def read_dv_file(path: str, offset: int, size_in_bytes: int) -> np.ndarray:
    """Read one deletion vector from a DV file: 1-byte format version at
    file start; at ``offset`` an i32 BE data size, the blob, and an
    i32 BE CRC-32 of the blob."""
    with open(path, "rb") as fh:
        if fh.read(1) != b"\x01":
            raise RoaringError(f"{path}: unsupported DV file format version")
        fh.seek(offset)
        (stored_size,) = struct.unpack(">i", fh.read(4))
        if stored_size != size_in_bytes:
            raise RoaringError(
                f"{path}: DV size mismatch (file {stored_size}, "
                f"log {size_in_bytes})"
            )
        data = fh.read(stored_size)
        (crc,) = struct.unpack(">I", fh.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise RoaringError(f"{path}: DV checksum mismatch")
    return decode_dv_blob(data)


def write_dv_file(path: str, positions) -> tuple[int, int]:
    """Author a single-vector DV file; returns (offset, sizeInBytes) for
    the add action (the writer half, used by tests and future DV-writing
    DML)."""
    blob = encode_dv_blob(positions)
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        offset = fh.tell()
        fh.write(struct.pack(">i", len(blob)))
        fh.write(blob)
        fh.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    return offset, len(blob)

"""Pure-Python MP4 (ISO BMFF) metadata parsing — the video column surface.

Frame DECODE needs native codecs (absent from this environment — the gap is
raised by name in operators/multimodal.decode_image); container METADATA
does not: MP4 is a tree of length-prefixed boxes, and duration/timescale/
track dimensions live in plain big-endian fields (mvhd/tkhd, ISO 14496-12).
This walker reads exactly those, so the video pipeline's metadata stage
(schema inference, duration filtering, resolution bucketing) is real.

``build_minimal_mp4`` constructs a spec-conformant ftyp+moov skeleton used
by the oracle-gated query and tests — a real box tree, parseable by any
MP4 tool, with no media data (mdat omitted; metadata-only fixture).
"""

from __future__ import annotations

import struct


def _box(kind: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + kind + body


def build_minimal_mp4(
    duration: int, timescale: int = 600, width: int = 640, height: int = 360
) -> bytes:
    """ftyp + moov(mvhd + trak(tkhd)) with the given duration (in timescale
    units) and track pixel dimensions (16.16 fixed point per spec)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/alt/volume/reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return ftyp + moov


def build_mp4_with_samples(
    duration: int,
    sample_sizes: list[int],
    sample_delta: int,
    timescale: int = 600,
    width: int = 640,
    height: int = 360,
) -> bytes:
    """ftyp + mdat + moov with a full sample table (stts/stsc/stsz/stco,
    ISO 14496-12 §8.6-8.7): every sample in one chunk, constant dts delta,
    per-sample sizes. mdat comes BEFORE moov (spec-legal), so the single
    chunk offset is the constant len(ftyp) + 8 — closed-form for oracles."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"\x00" * sum(sample_sizes))
    chunk_off = len(ftyp) + 8  # first media byte: after ftyp + mdat header

    base = build_minimal_mp4(duration, timescale, width, height)
    # reuse the mvhd/tkhd bodies from the minimal builder
    moov_body = base[len(ftyp) + 8 :]
    mvhd_size = struct.unpack_from(">I", moov_body, 0)[0]
    mvhd = moov_body[:mvhd_size]
    trak_old = moov_body[mvhd_size:]
    tkhd = trak_old[8:]  # trak box header stripped -> tkhd box

    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    n = len(sample_sizes)
    stts = _box(
        b"stts", struct.pack(">B3xI", 0, 1) + struct.pack(">II", n, sample_delta)
    )
    stsc = _box(
        b"stsc", struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, n, 1)
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, n)
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    stco = _box(b"stco", struct.pack(">B3xI", 0, 1) + struct.pack(">I", chunk_off))
    stbl = _box(b"stbl", stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", tkhd + mdia)
    return ftyp + mdat + _box(b"moov", mvhd + trak)


def parse_mp4_samples(data: bytes) -> list[dict]:
    """Resolve the sample table to per-sample records:
    [{idx, size, offset, dts_seconds}] — exactly what a codec needs to
    seek-read individual frames without scanning the mdat. Raises by name
    on payloads without a sample table."""
    if len(data) < 8 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 file (missing leading ftyp box)")
    found: dict = {}

    def walk(buf: bytes, start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            size = struct.unpack_from(">I", buf, pos)[0]
            kind = buf[pos + 4 : pos + 8]
            if size < 8 or pos + size > end:
                raise ValueError(f"truncated MP4 box {kind!r}")
            body = pos + 8
            if kind in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(buf, body, pos + size)
            elif kind == b"mdhd":
                ver = buf[body]
                if ver == 0:
                    found["timescale"] = struct.unpack_from(">I", buf, body + 12)[0]
                else:
                    found["timescale"] = struct.unpack_from(">I", buf, body + 20)[0]
            elif kind == b"stts":
                cnt = struct.unpack_from(">I", buf, body + 4)[0]
                found["stts"] = [
                    struct.unpack_from(">II", buf, body + 8 + 8 * i)
                    for i in range(cnt)
                ]
            elif kind == b"stsz":
                uniform, cnt = struct.unpack_from(">II", buf, body + 4)
                if uniform:
                    found["sizes"] = [uniform] * cnt
                else:
                    found["sizes"] = [
                        struct.unpack_from(">I", buf, body + 12 + 4 * i)[0]
                        for i in range(cnt)
                    ]
            elif kind == b"stco":
                cnt = struct.unpack_from(">I", buf, body + 4)[0]
                found["chunk_offsets"] = [
                    struct.unpack_from(">I", buf, body + 8 + 4 * i)[0]
                    for i in range(cnt)
                ]
            pos += size

    walk(data, 0, len(data))
    for req in ("timescale", "stts", "sizes", "chunk_offsets"):
        if req not in found:
            raise ValueError(f"MP4 has no resolvable sample table (missing {req})")
    deltas: list[int] = []
    for cnt, delta in found["stts"]:
        deltas.extend([delta] * cnt)
    samples, off, dts = [], found["chunk_offsets"][0], 0
    for i, sz in enumerate(found["sizes"]):
        samples.append(
            {
                "idx": i,
                "size": sz,
                "offset": off,
                "dts_seconds": dts / found["timescale"],
            }
        )
        off += sz
        dts += deltas[i] if i < len(deltas) else 0
    return samples


def parse_mp4_meta(data: bytes) -> dict:
    """Walk the top-level box tree; return duration_seconds, timescale,
    width, height, major_brand. Raises on non-MP4 payloads by name."""
    if len(data) < 8 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 file (missing leading ftyp box)")
    meta: dict = {"major_brand": data[8:12].decode("latin-1")}

    def walk(buf: bytes, start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            size = struct.unpack_from(">I", buf, pos)[0]
            kind = buf[pos + 4 : pos + 8]
            if size < 8 or pos + size > end:
                raise ValueError(f"truncated MP4 box {kind!r}")
            body_at = pos + 8
            if kind in (b"moov", b"trak"):
                walk(buf, body_at, pos + size)
            elif kind == b"mvhd":
                ver = buf[body_at]
                if ver == 0:
                    ts, dur = struct.unpack_from(">II", buf, body_at + 12)
                else:  # version 1: 64-bit times
                    ts = struct.unpack_from(">I", buf, body_at + 20)[0]
                    dur = struct.unpack_from(">Q", buf, body_at + 24)[0]
                meta["timescale"] = ts
                meta["duration_seconds"] = dur / ts
            elif kind == b"tkhd":
                ver = buf[body_at]
                # verflags(4) + times/id/dur (20 v0, 32 v1) + reserved(8)
                # + layer/alt/vol/reserved(8) + matrix(36) -> width
                off = body_at + (76 if ver == 0 else 88)
                w, h = struct.unpack_from(">II", buf, off)
                meta["width"] = w >> 16
                meta["height"] = h >> 16
            pos += size

    walk(data, 0, len(data))
    if "timescale" not in meta:
        raise ValueError("truncated MP4: no mvhd box found")
    return meta

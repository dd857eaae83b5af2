"""Pure-Python baseline JPEG codec — no native libraries.

Completes the image-format set (imagecodec.py: BMP/PPM/PNG/GIF) with the
dominant web-corpus format. Scope: baseline sequential DCT (SOF0), 8-bit,
Huffman entropy coding (tables read from the file), 4:4:4 / 4:2:0 / 4:2:2
chroma subsampling, restart markers, grayscale and YCbCr. The IDCT/DCT
are exact orthonormal matrix transforms (numpy); encode uses the spec's
Annex K quantization + Huffman tables at quality 75-equivalent scaling.

JPEG is lossy: round-trip tests assert reconstruction error bounds (and
exact DC reconstruction for uniform blocks), not byte equality.
Executors run this inside Arrow-batched mapInPandas like every other
codec here — per-payload CPU, map-only.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables -----------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU-T T.81 Annex K
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])
# Annex K Huffman specs: (bits[1..16], values)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [1, 2, 3, 0, 4, 17, 5, 18, 33, 49, 65, 6, 19, 81, 97, 7, 34, 113,
     20, 50, 129, 145, 161, 8, 35, 66, 177, 193, 21, 82, 209, 240, 36,
     51, 98, 114, 130, 9, 10, 22, 23, 24, 25, 26, 37, 38, 39, 40, 41,
     42, 52, 53, 54, 55, 56, 57, 58, 67, 68, 69, 70, 71, 72, 73, 74,
     83, 84, 85, 86, 87, 88, 89, 90, 99, 100, 101, 102, 103, 104, 105,
     106, 115, 116, 117, 118, 119, 120, 121, 122, 131, 132, 133, 134,
     135, 136, 137, 138, 146, 147, 148, 149, 150, 151, 152, 153, 154,
     162, 163, 164, 165, 166, 167, 168, 169, 170, 178, 179, 180, 181,
     182, 183, 184, 185, 186, 194, 195, 196, 197, 198, 199, 200, 201,
     202, 210, 211, 212, 213, 214, 215, 216, 217, 218, 225, 226, 227,
     228, 229, 230, 231, 232, 233, 234, 241, 242, 243, 244, 245, 246,
     247, 248, 249, 250],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0, 1, 2, 3, 17, 4, 5, 33, 49, 6, 18, 65, 81, 7, 97, 113, 19, 34,
     50, 129, 8, 20, 66, 145, 161, 177, 193, 9, 35, 51, 82, 240, 21,
     98, 114, 209, 10, 22, 36, 52, 225, 37, 241, 23, 24, 25, 26, 38,
     39, 40, 41, 42, 53, 54, 55, 56, 57, 58, 67, 68, 69, 70, 71, 72,
     73, 74, 83, 84, 85, 86, 87, 88, 89, 90, 99, 100, 101, 102, 103,
     104, 105, 106, 115, 116, 117, 118, 119, 120, 121, 122, 130, 131,
     132, 133, 134, 135, 136, 137, 138, 146, 147, 148, 149, 150, 151,
     152, 153, 154, 162, 163, 164, 165, 166, 167, 168, 169, 170, 178,
     179, 180, 181, 182, 183, 184, 185, 186, 194, 195, 196, 197, 198,
     199, 200, 201, 202, 210, 211, 212, 213, 214, 215, 216, 217, 218,
     226, 227, 228, 229, 230, 231, 232, 233, 234, 242, 243, 244, 245,
     246, 247, 248, 249, 250],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5


_DCT_M = _dct_matrix()


def _build_huff_decode(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[i]
            i += 1
            code += 1
        code <<= 1
    return table


def _build_huff_encode(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length)."""
    out = {}
    for (ln, code), v in _build_huff_decode(bits, values).items():
        out[v] = (code, ln)
    return out


# --- decoder -----------------------------------------------------------------


class _BitReader:
    """Entropy-coded segment reader with 0xFF00 unstuffing and restart
    marker handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: handled by caller
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:  # EOI or next segment: pad with zeros
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("bad JPEG huffman code")

    def restart(self) -> None:
        """Consume a restart marker at the current byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, n: int) -> int:
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    w = h = 0
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                qt[tq] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + c * 3)
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0x0F, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError(
                "unsupported JPEG SOF type (baseline sequential only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nval = sum(bits)
                vals = list(body[i + 17 : i + 17 + nval])
                (huff_ac if tc else huff_dc)[th] = _build_huff_decode(bits, vals)
                i += 17 + nval
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scomp = []
            for c in range(ns):
                cs, tables = body[1 + c * 2], body[2 + c * 2]
                comp = next(x for x in comps if x["id"] == cs)
                scomp.append(
                    {**comp, "dc": huff_dc[tables >> 4], "ac": huff_ac[tables & 0x0F]}
                )
            return _decode_scan(
                data, pos + 2 + seglen, scomp, qt, w, h, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("JPEG missing SOS")


def _decode_scan(data, pos, comps, qt, w, h, restart_interval):
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["hs"], mcuy * 8 * c["vs"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                q = qt[c["tq"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = np.zeros(64, dtype=np.int32)
                        t = br.huff(c["dc"])
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(c["ac"])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = blk * q
                        b8 = coef.reshape(8, 8)
                        px = _DCT_M.T @ b8 @ _DCT_M  # IDCT
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px + 128
            mcu_count += 1
    # upsample to full resolution and convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["hs"] != hmax or c["vs"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["vs"], 0), hmax // c["hs"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    n = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return (n, v if v >= 0 else v + (1 << n) - 1)


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline 4:4:4 JPEG
    (Annex K quantization + Huffman tables)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128
    qy = _QUANT_LUMA.reshape(8, 8)
    qc = _QUANT_CHROMA.reshape(8, 8)
    enc_dc = [_build_huff_encode(*_DC_LUMA_SPEC), _build_huff_encode(*_DC_CHROMA_SPEC)]
    enc_ac = [_build_huff_encode(*_AC_LUMA_SPEC), _build_huff_encode(*_AC_CHROMA_SPEC)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for plane in (y, cb, cr):
        p = np.pad(plane, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge")
        padded.append(p)
    for by in range(bh):
        for bx in range(bwid):
            for ci, plane in enumerate(padded):
                q = qy if ci == 0 else qc
                tsel = 0 if ci == 0 else 1
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128
                coef = _DCT_M @ blk @ _DCT_M.T
                quant = np.round(coef / q).astype(np.int32)
                zz = quant.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                n, m = _magnitude(diff) if diff else (0, 0)
                code, ln = enc_dc[tsel][n]
                bw.write(code, ln)
                if n:
                    bw.write(m, n)
                run = 0
                last = 63
                while last > 0 and zz[last] == 0:
                    last -= 1
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[tsel][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    n, m = _magnitude(v)
                    code, ln = enc_ac[tsel][(run << 4) | n]
                    bw.write(code, ln)
                    bw.write(m, n)
                    run = 0
                if last < 63:
                    code, ln = enc_ac[tsel][0x00]
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + _QUANT_LUMA.astype(np.uint8).tobytes())
    out += seg(0xDB, b"\x01" + _QUANT_CHROMA.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    out += seg(0xC0, sof)
    for tc_th, spec in (
        (0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC),
        (0x01, _DC_CHROMA_SPEC), (0x11, _AC_CHROMA_SPEC),
    ):
        bits, vals = spec
        out += seg(0xC4, bytes([tc_th] + bits + vals))
    sos = struct.pack(">B", 3)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tabs)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)

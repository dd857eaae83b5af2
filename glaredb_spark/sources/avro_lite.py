"""Minimal pure-Python Avro Object Container File reader.

Iceberg's table metadata layer stores manifest lists and manifests as
Avro container files (reference: crates/glaredb_ext_iceberg — its Rust
reader decodes the same two file families). No Avro library ships in
this environment, so this is a from-scratch decoder of exactly the
container spec subset those files use:

- header: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker;
- data blocks: record count, byte length, payload, sync;
- codecs: ``null`` and ``deflate`` (raw zlib);
- types: null, boolean, int/long (zigzag varint), float, double, bytes,
  string, record, enum, array, map, union, fixed. Logical types are
  returned as their raw representation.

Not a general Avro implementation (no schema resolution/evolution, no
snappy): Iceberg writes self-contained files read with their own
embedded schema, which is all the scan path needs.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Any

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise AvroError("truncated avro data")
        self.pos += n
        return b

    def long(self) -> int:
        acc, shift = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, list):  # union: index then value
        idx = r.long()
        return _decode(r, schema[idx])
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.long())
    if t == "string":
        return r.read(r.long()).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                r.long()
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.read(r.long()).decode("utf-8")
                out[k] = _decode(r, schema["values"])
        return out
    raise AvroError(f"unsupported avro type: {t!r}")


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema: Any, value: Any) -> bytes:
    if isinstance(schema, list):  # union: encode branch by value
        for i, s in enumerate(schema):
            t = s if isinstance(s, str) else s["type"]
            if (value is None) == (t == "null"):
                return _zigzag(i) + _encode(s, value)
        raise AvroError("no union branch for value")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(value))
    if t == "float":
        return struct.pack("<f", value)
    if t == "double":
        return struct.pack("<d", value)
    if t == "bytes":
        return _zigzag(len(value)) + bytes(value)
    if t == "string":
        b = value.encode("utf-8")
        return _zigzag(len(b)) + b
    if t == "record":
        return b"".join(
            _encode(f["type"], value.get(f["name"])) for f in schema["fields"]
        )
    if t == "array":
        if not value:
            return _zigzag(0)
        body = b"".join(_encode(schema["items"], v) for v in value)
        return _zigzag(len(value)) + body + _zigzag(0)
    if t == "map":
        if not value:
            return _zigzag(0)
        body = b"".join(
            _zigzag(len(k.encode())) + k.encode() + _encode(schema["values"], v)
            for k, v in value.items()
        )
        return _zigzag(len(value)) + body + _zigzag(0)
    raise AvroError(f"write: unsupported avro type {t!r}")


def write_avro(path: str, schema: dict, records: list[dict]) -> None:
    """Write a null-codec Avro container (the writer half used by tests
    and the authored-table driver query; the scan path only reads)."""
    sync = b"\x00" * 8 + b"glaredbsp"[:8]
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    out = bytearray(_MAGIC)
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    payload = b"".join(_encode(schema, r) for r in records)
    out += _zigzag(len(records)) + _zigzag(len(payload)) + payload + sync
    with open(path, "wb") as fh:
        fh.write(out)


def read_avro(path: str) -> tuple[list[dict], dict]:
    """→ (records, file_metadata) for an Avro object container file."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != _MAGIC:
        raise AvroError(f"{path}: not an avro container file")
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.read(r.long()).decode("utf-8")
            meta[k] = bytes(r.read(r.long()))
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec: {codec}")
    records: list[dict] = []
    while not r.at_end():
        count = r.long()
        size = r.long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise AvroError(f"{path}: sync marker mismatch")
    return records, {k: v for k, v in meta.items()}

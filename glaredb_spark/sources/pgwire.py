"""Minimal pure-Python PostgreSQL v3 wire-protocol client.

The reference reads external Postgres databases through its own Rust
client (crates: read_postgres table function + ATTACH POSTGRES,
slt/postgres/*.slt). No postgres driver (psycopg2/pg8000/JDBC jar)
ships in this environment, so this speaks the documented v3 protocol
directly: StartupMessage → authentication (trust / cleartext / md5 /
SCRAM-SHA-256) → simple-query ('Q') → RowDescription/DataRow in text
format.

Scope: metadata + table reads for the read_postgres/ATTACH surface —
simple queries only, text results, no COPY, no extended protocol, no
TLS. At 100 TB the executor-side path is Spark's JDBC partitioned read
(needs the driver jar); this client is the jar-less driver-side
fallback, like the boto3 S3 path (sources/objectstore.py).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import socket
import struct
from dataclasses import dataclass
from decimal import Decimal

__all__ = ["connect", "parse_conninfo", "PgError", "PgConnection"]


class PgError(RuntimeError):
    pass


def parse_conninfo(conn: str) -> dict:
    """postgres:// URI or key=value conninfo → dict."""
    info = {"host": "localhost", "port": 5432, "user": None,
            "password": None, "dbname": None}
    conn = conn.strip()
    m = re.match(r"^postgres(?:ql)?://(?:([^:@/]+)(?::([^@/]*))?@)?"
                 r"([^:/?]+)?(?::(\d+))?(?:/([^?]*))?", conn)
    if m:
        user, pw, host, port, db = m.groups()
        if user:
            info["user"] = user
        if pw:
            info["password"] = pw
        if host:
            info["host"] = host
        if port:
            info["port"] = int(port)
        if db:
            info["dbname"] = db
    else:
        for km in re.finditer(r"(\w+)\s*=\s*('[^']*'|\S+)", conn):
            k, v = km.group(1).lower(), km.group(2).strip("'")
            if k == "port":
                info["port"] = int(v)
            elif k in info:
                info[k] = v
    if not info["user"]:
        info["user"] = os.environ.get("USER", "postgres")
    if not info["dbname"]:
        info["dbname"] = info["user"]
    return info


@dataclass
class Column:
    name: str
    type_oid: int


# text-format decoders by type OID
def _decode(oid: int, v: str | None):
    if v is None:
        return None
    if oid == 16:
        return v == "t"
    if oid in (20, 21, 23, 26):
        return int(v)
    if oid in (700, 701):
        return float(v)
    if oid == 1700:
        return Decimal(v)
    if oid == 17:  # bytea hex
        return bytes.fromhex(v[2:]) if v.startswith("\\x") else v.encode()
    if oid == 1082:
        import datetime

        return datetime.date.fromisoformat(v)
    if oid in (1114, 1184):
        import datetime

        return datetime.datetime.fromisoformat(v.replace(" ", "T"))
    return v


def spark_type(oid: int) -> str:
    return {
        16: "boolean", 20: "long", 21: "short", 23: "int", 26: "long",
        700: "float", 701: "double", 1700: "decimal(38,18)",
        17: "binary", 1082: "date", 1114: "timestamp_ntz",
        1184: "timestamp",
    }.get(oid, "string")


class PgConnection:
    def __init__(self, sock: socket.socket):
        self._s = sock
        self._buf = b""

    # --- framing ------------------------------------------------------------

    def _recv(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._s.recv(65536)
            if not chunk:
                raise PgError("server closed connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _msg(self) -> tuple[bytes, bytes]:
        t = self._recv(1)
        (ln,) = struct.unpack("!I", self._recv(4))
        return t, self._recv(ln - 4)

    def _send(self, t: bytes, payload: bytes) -> None:
        self._s.sendall(t + struct.pack("!I", len(payload) + 4) + payload)

    # --- auth ---------------------------------------------------------------

    def _auth(self, user: str, password: str | None) -> None:
        while True:
            t, body = self._msg()
            if t == b"E":
                raise PgError(_error_text(body))
            if t != b"R":
                raise PgError(f"unexpected message during auth: {t!r}")
            (code,) = struct.unpack("!I", body[:4])
            if code == 0:
                return  # AuthenticationOk
            if code == 3:  # cleartext
                self._send(b"p", (password or "").encode() + b"\x00")
            elif code == 5:  # md5
                salt = body[4:8]
                inner = hashlib.md5(
                    (password or "").encode() + user.encode()
                ).hexdigest()
                digest = hashlib.md5(inner.encode() + salt).hexdigest()
                self._send(b"p", b"md5" + digest.encode() + b"\x00")
            elif code == 10:  # SASL: SCRAM-SHA-256
                self._scram(password or "")
            else:
                raise PgError(f"unsupported auth method {code}")

    def _scram(self, password: str) -> None:
        nonce = base64.b64encode(os.urandom(18)).decode()
        first = f"n,,n=,r={nonce}".encode()
        self._send(
            b"p",
            b"SCRAM-SHA-256\x00" + struct.pack("!I", len(first)) + first,
        )
        t, body = self._msg()
        if t == b"E":
            raise PgError(_error_text(body))
        (code,) = struct.unpack("!I", body[:4])
        if code != 11:
            raise PgError("expected SASLContinue")
        server_first = body[4:].decode()
        parts = dict(p.split("=", 1) for p in server_first.split(","))
        r, s, i = parts["r"], base64.b64decode(parts["s"]), int(parts["i"])
        salted = hashlib.pbkdf2_hmac("sha256", password.encode(), s, i)
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored = hashlib.sha256(client_key).digest()
        without_proof = f"c={base64.b64encode(b'n,,').decode()},r={r}"
        auth_msg = f"n=,r={nonce},{server_first},{without_proof}".encode()
        sig = hmac.new(stored, auth_msg, hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        final = f"{without_proof},p={base64.b64encode(proof).decode()}".encode()
        self._send(b"p", final)
        t, body = self._msg()
        if t == b"E":
            raise PgError(_error_text(body))
        (code,) = struct.unpack("!I", body[:4])
        if code != 12:
            raise PgError("expected SASLFinal")

    # --- queries ------------------------------------------------------------

    def query(self, sql: str) -> tuple[list[Column], list[list]]:
        """Simple-query protocol; returns (columns, decoded rows)."""
        self._send(b"Q", sql.encode() + b"\x00")
        cols: list[Column] = []
        rows: list[list] = []
        err: str | None = None
        while True:
            t, body = self._msg()
            if t == b"T":
                cols = []
                (n,) = struct.unpack("!H", body[:2])
                pos = 2
                for _ in range(n):
                    end = body.index(b"\x00", pos)
                    name = body[pos:end].decode()
                    pos = end + 1
                    _tab, _att, oid, _len, _mod, _fmt = struct.unpack(
                        "!IHIhih", body[pos : pos + 18]
                    )
                    pos += 18
                    cols.append(Column(name, oid))
            elif t == b"D":
                (n,) = struct.unpack("!H", body[:2])
                pos = 2
                row = []
                for c in range(n):
                    (ln,) = struct.unpack("!i", body[pos : pos + 4])
                    pos += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(
                            _decode(cols[c].type_oid, body[pos : pos + ln].decode())
                        )
                        pos += ln
                rows.append(row)
            elif t == b"E":
                err = _error_text(body)
            elif t == b"Z":
                if err:
                    raise PgError(err)
                return cols, rows
            # 'C' CommandComplete, 'N' notices, 'S' params: ignore

    def close(self) -> None:
        try:
            self._send(b"X", b"")
            self._s.close()
        except Exception:  # noqa: BLE001
            pass


def _error_text(body: bytes) -> str:
    fields = {}
    for part in body.split(b"\x00"):
        if part:
            fields[chr(part[0])] = part[1:].decode(errors="replace")
    return fields.get("M", "postgres error")


def connect(conninfo: str | dict, timeout: float = 10.0) -> PgConnection:
    info = parse_conninfo(conninfo) if isinstance(conninfo, str) else conninfo
    s = socket.create_connection((info["host"], info["port"]), timeout=timeout)
    conn = PgConnection(s)
    params = {"user": info["user"], "database": info["dbname"],
              "client_encoding": "UTF8"}
    payload = struct.pack("!I", 196608)  # protocol 3.0
    for k, v in params.items():
        payload += k.encode() + b"\x00" + str(v).encode() + b"\x00"
    payload += b"\x00"
    s.sendall(struct.pack("!I", len(payload) + 4) + payload)
    conn._auth(info["user"], info.get("password"))
    # drain until ReadyForQuery
    while True:
        t, body = conn._msg()
        if t == b"Z":
            return conn
        if t == b"E":
            raise PgError(_error_text(body))

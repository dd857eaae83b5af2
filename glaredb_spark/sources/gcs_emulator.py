"""Minimal in-process Google Cloud Storage emulator (JSON API subset).

A from-scratch test double implementing the two public GCS JSON API
endpoints the jar-less ``gs://`` fallback in sources/objectstore.py
speaks (https://cloud.google.com/storage/docs/json_api/v1):

- ``GET /storage/v1/b/<bucket>/o`` — object listing with ``prefix`` and
  ``pageToken``/``maxResults`` pagination,
- ``GET /storage/v1/b/<bucket>/o/<url-encoded name>?alt=media`` — object
  media download (metadata JSON without ``alt=media``),
- ``POST /upload/storage/v1/b/<bucket>/o?uploadType=media&name=...`` —
  media upload honoring ``ifGenerationMatch`` preconditions (412 on
  mismatch; ``ifGenerationMatch=0`` = create-only), the conditional-
  write primitive lakehouse commits publish through (r11).

Serving is real HTTP on a loopback port (ThreadingHTTPServer), so the
client exercises its actual wire path — endpoint discovery via the
standard ``STORAGE_EMULATOR_HOST`` convention (the same env var
fake-gcs-server and Google's own client libraries honor), URL encoding,
pagination, and 404 handling — not a stub. The reference tests its
native GCS client (crates/glaredb_http/src/gcs/) against the real
public buckets; this container has no network, so the same SLT files
run against this emulator serving identical content.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE_SIZE_DEFAULT = 1000


class GcsEmulator:
    """In-memory bucket/object store behind a live HTTP listener.

    Buckets created with ``private=True`` reject unauthenticated
    requests (401/403); access requires the service-account OAuth flow:
    the client POSTs an RS256-signed JWT assertion to ``/token``
    (google's jwt-bearer grant), the emulator verifies the signature
    against the registered account's public key and issues a bearer
    token it then accepts on object requests. This makes the jar-less
    gs:// client's auth path (sources/objectstore.py) a real wire
    exercise, not a stub."""

    def __init__(self) -> None:
        self._objects: dict[str, dict[str, bytes]] = {}
        self._gens: dict[str, dict[str, int]] = {}  # object generations
        self._private: set[str] = set()
        self._accounts: dict[str, object] = {}  # email -> public key
        self._tokens: set[str] = set()
        self._lock = threading.Lock()  # precondition-check + write
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- fixture population ------------------------------------------------

    def create_bucket(self, bucket: str, private: bool = False) -> None:
        self._objects.setdefault(bucket, {})
        if private:
            self._private.add(bucket)

    def register_service_account(self, email: str, public_key_pem: bytes) -> None:
        from cryptography.hazmat.primitives.serialization import (
            load_pem_public_key,
        )

        self._accounts[email] = load_pem_public_key(public_key_pem)

    def put_object(self, bucket: str, key: str, data: bytes) -> None:
        self._objects.setdefault(bucket, {})[key] = data
        g = self._gens.setdefault(bucket, {})
        g[key] = g.get(key, 0) + 1

    def upload_file(self, path: str, bucket: str, key: str) -> None:
        with open(path, "rb") as fh:
            self.put_object(bucket, key, fh.read())

    # -- server ------------------------------------------------------------

    def start(self) -> str:
        """Bind a loopback port and serve; returns ``host:port``."""
        store = self._objects
        gens, lock = self._gens, self._lock
        private, accounts, tokens = self._private, self._accounts, self._tokens

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # quiet
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authorized(self, bucket: str) -> bool:
                if bucket not in private:
                    return True
                auth = self.headers.get("Authorization", "")
                return (
                    auth.startswith("Bearer ")
                    and auth[len("Bearer "):] in tokens
                )

            def do_POST(self) -> None:  # noqa: N802 — http.server API
                parsed = urllib.parse.urlsplit(self.path)
                parts = parsed.path.split("/")
                # /upload/storage/v1/b/<bucket>/o — media upload with
                # ifGenerationMatch preconditions (the conditional-write
                # primitive; check+write under one lock, like real GCS's
                # per-object metadata transaction)
                if (
                    len(parts) >= 7
                    and parts[1:5] == ["upload", "storage", "v1", "b"]
                    and parts[6] == "o"
                ):
                    bucket = urllib.parse.unquote(parts[5])
                    q = urllib.parse.parse_qs(parsed.query)
                    key = q.get("name", [""])[0]
                    if not self._authorized(bucket):
                        self._json(403, {"error": {"code": 403,
                                                   "message": "denied"}})
                        return
                    if bucket not in store or not key:
                        self._json(404, {"error": {"code": 404,
                                                   "message": "bucket"}})
                        return
                    n = int(self.headers.get("Content-Length", "0"))
                    data = self.rfile.read(n)
                    want = q.get("ifGenerationMatch", [None])[0]
                    with lock:
                        cur = gens.setdefault(bucket, {}).get(key, 0)
                        if want is not None and int(want) != cur:
                            self._json(412, {"error": {
                                "code": 412,
                                "message": "conditionNotMet",
                            }})
                            return
                        store[bucket][key] = data
                        gens[bucket][key] = cur + 1
                        gen = cur + 1
                    self._json(200, {
                        "kind": "storage#object", "name": key,
                        "bucket": bucket, "size": str(len(data)),
                        "generation": str(gen),
                    })
                    return
                if parsed.path != "/token":
                    self._json(404, {"error": "not found"})
                    return
                import base64
                import secrets

                from cryptography.hazmat.primitives.asymmetric import padding
                from cryptography.hazmat.primitives.hashes import SHA256

                n = int(self.headers.get("Content-Length", "0"))
                form = urllib.parse.parse_qs(self.rfile.read(n).decode())
                assertion = form.get("assertion", [""])[0]
                try:
                    head_b64, claims_b64, sig_b64 = assertion.split(".")

                    def _unb64(s: str) -> bytes:
                        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))

                    claims = json.loads(_unb64(claims_b64))
                    key = accounts[claims["iss"]]
                    key.verify(
                        _unb64(sig_b64),
                        f"{head_b64}.{claims_b64}".encode(),
                        padding.PKCS1v15(),
                        SHA256(),
                    )
                except Exception:
                    self._json(401, {"error": "invalid_grant"})
                    return
                token = secrets.token_urlsafe(24)
                tokens.add(token)
                self._json(
                    200,
                    {"access_token": token, "token_type": "Bearer",
                     "expires_in": 3600},
                )

            def do_HEAD(self) -> None:  # noqa: N802 — http.server API
                parsed = urllib.parse.urlsplit(self.path)
                parts = parsed.path.split("/")
                code = 404
                if (
                    len(parts) >= 7
                    and parts[1:4] == ["storage", "v1", "b"]
                    and parts[5] == "o"
                ):
                    bucket = urllib.parse.unquote(parts[4])
                    key = urllib.parse.unquote("/".join(parts[6:]))
                    if not self._authorized(bucket):
                        code = 403
                    elif key in store.get(bucket, {}):
                        code = 200
                self.send_response(code)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self) -> None:  # noqa: N802 — http.server API
                parsed = urllib.parse.urlsplit(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                parts = parsed.path.split("/")
                # /storage/v1/b/<bucket>/o[/<object>]
                if (
                    len(parts) >= 5
                    and parts[1] == "storage"
                    and parts[2] == "v1"
                    and parts[3] == "b"
                    and parts[5:6] == ["o"]
                ):
                    bucket = urllib.parse.unquote(parts[4])
                    if not self._authorized(bucket):
                        self._json(
                            403,
                            {"error": {"code": 403,
                                       "message": "access denied"}},
                        )
                        return
                    objs = store.get(bucket)
                    if objs is None:
                        self._json(404, {"error": {"code": 404,
                                                   "message": "bucket"}})
                        return
                    if len(parts) == 6:  # listing
                        prefix = q.get("prefix", [""])[0]
                        page = int(
                            q.get("maxResults", [_PAGE_SIZE_DEFAULT])[0]
                        )
                        names = sorted(
                            k for k in objs if k.startswith(prefix)
                        )
                        start = int(q.get("pageToken", ["0"])[0] or 0)
                        chunk = names[start : start + page]
                        out = {
                            "kind": "storage#objects",
                            "items": [
                                {
                                    "kind": "storage#object",
                                    "name": n,
                                    "bucket": bucket,
                                    "size": str(len(objs[n])),
                                }
                                for n in chunk
                            ],
                        }
                        if start + page < len(names):
                            out["nextPageToken"] = str(start + page)
                        self._json(200, out)
                        return
                    key = urllib.parse.unquote("/".join(parts[6:]))
                    data = objs.get(key)
                    if data is None:
                        self._json(404, {"error": {"code": 404,
                                                   "message": key}})
                        return
                    if q.get("alt", [""])[0] == "media":
                        self.send_response(200)
                        self.send_header(
                            "Content-Type", "application/octet-stream"
                        )
                        self.send_header("Content-Length", str(len(data)))
                        self.end_headers()
                        self.wfile.write(data)
                    else:
                        self._json(
                            200,
                            {
                                "kind": "storage#object",
                                "name": key,
                                "bucket": bucket,
                                "size": str(len(data)),
                            },
                        )
                    return
                self._json(404, {"error": {"code": 404, "message": "path"}})

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        host, port = self._server.server_address[:2]
        return f"{host}:{port}"

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None

"""Minimal in-process Google Cloud Storage emulator (JSON API subset).

A from-scratch test double implementing the two public GCS JSON API
endpoints the jar-less ``gs://`` fallback in sources/objectstore.py
speaks (https://cloud.google.com/storage/docs/json_api/v1):

- ``GET /storage/v1/b/<bucket>/o`` — object listing with ``prefix`` and
  ``pageToken``/``maxResults`` pagination,
- ``GET /storage/v1/b/<bucket>/o/<url-encoded name>?alt=media`` — object
  media download (metadata JSON without ``alt=media``).

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
    """In-memory bucket/object store behind a live HTTP listener."""

    def __init__(self) -> None:
        self._objects: dict[str, dict[str, bytes]] = {}
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- fixture population ------------------------------------------------

    def create_bucket(self, bucket: str) -> None:
        self._objects.setdefault(bucket, {})

    def put_object(self, bucket: str, key: str, data: bytes) -> None:
        self._objects.setdefault(bucket, {})[key] = data

    def upload_file(self, path: str, bucket: str, key: str) -> None:
        with open(path, "rb") as fh:
            self.put_object(bucket, key, fh.read())

    # -- server ------------------------------------------------------------

    def start(self) -> str:
        """Bind a loopback port and serve; returns ``host:port``."""
        store = self._objects

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

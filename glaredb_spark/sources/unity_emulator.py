"""Minimal in-process Unity Catalog server (OSS REST API subset).

A from-scratch test double for the public open-source Unity Catalog
REST API (unitycatalog.io; ``/api/2.1/unity-catalog``): schema and
table listings with ``page_token`` pagination, and single-table info by
full name. Serves real HTTP on a configurable loopback port so the
client in sources/unity.py exercises its actual wire path. The default
fixture mirrors the OSS quickstart sample catalog — the exact content
the reference's slt/unity_catalog goldens enumerate (the reference ran
those against a live local server; this container has no network, so
the same SLT files run against this emulator).
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE_SIZE = 100

# The OSS unitycatalog quickstart sample data (public fixture content;
# slt/unity_catalog/list_tables.slt goldens).
QUICKSTART_SCHEMAS = [
    {"name": "default", "catalog_name": "unity", "comment": "Default schema"},
]
QUICKSTART_TABLES = [
    {
        "name": "marksheet",
        "catalog_name": "unity",
        "schema_name": "default",
        "table_type": "MANAGED",
        "data_source_format": "DELTA",
        "storage_location": (
            "file:///opt/unitycatalog/etc/data/managed/unity/default/"
            "tables/marksheet/"
        ),
        "comment": "Managed table",
    },
    {
        "name": "marksheet_uniform",
        "catalog_name": "unity",
        "schema_name": "default",
        "table_type": "EXTERNAL",
        "data_source_format": "DELTA",
        "storage_location": "file:///tmp/marksheet_uniform",
        "comment": "Uniform table",
    },
    {
        "name": "numbers",
        "catalog_name": "unity",
        "schema_name": "default",
        "table_type": "EXTERNAL",
        "data_source_format": "DELTA",
        "storage_location": (
            "file:///opt/unitycatalog/etc/data/external/unity/default/"
            "tables/numbers/"
        ),
        "comment": "External table",
    },
    {
        "name": "user_countries",
        "catalog_name": "unity",
        "schema_name": "default",
        "table_type": "EXTERNAL",
        "data_source_format": "DELTA",
        "storage_location": (
            "file:///opt/unitycatalog/etc/data/external/unity/default/"
            "tables/user_countries/"
        ),
        "comment": "Partitioned table",
    },
]


class UnityEmulator:
    def __init__(
        self,
        schemas: list[dict] | None = None,
        tables: list[dict] | None = None,
    ) -> None:
        self.schemas = list(QUICKSTART_SCHEMAS if schemas is None else schemas)
        self.tables = list(QUICKSTART_TABLES if tables is None else tables)
        self._server: ThreadingHTTPServer | None = None

    def add_table(self, **info) -> None:
        self.tables.append(info)

    def start(self, port: int = 0) -> str:
        """Serve on 127.0.0.1:<port> (0 = ephemeral); returns the
        endpoint URL."""
        schemas, tables = self.schemas, self.tables

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _page(self, items: list[dict], q: dict, key: str) -> None:
                start = int(q.get("page_token", ["0"])[0] or 0)
                chunk = items[start : start + _PAGE_SIZE]
                out: dict = {key: chunk}
                if start + _PAGE_SIZE < len(items):
                    out["next_page_token"] = str(start + _PAGE_SIZE)
                self._json(200, out)

            def do_GET(self) -> None:  # noqa: N802 — http.server API
                parsed = urllib.parse.urlsplit(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                path = parsed.path
                base = "/api/2.1/unity-catalog"
                if path == f"{base}/schemas":
                    cat = q.get("catalog_name", [""])[0]
                    self._page(
                        sorted(
                            (s for s in schemas
                             if s["catalog_name"] == cat),
                            key=lambda s: s["name"],
                        ),
                        q, "schemas",
                    )
                elif path == f"{base}/tables":
                    cat = q.get("catalog_name", [""])[0]
                    sch = q.get("schema_name", [""])[0]
                    self._page(
                        sorted(
                            (t for t in tables
                             if t["catalog_name"] == cat
                             and t["schema_name"] == sch),
                            key=lambda t: t["name"],
                        ),
                        q, "tables",
                    )
                elif path.startswith(f"{base}/tables/"):
                    full = urllib.parse.unquote(
                        path[len(f"{base}/tables/"):]
                    )
                    parts = full.split(".")
                    hit = next(
                        (
                            t for t in tables
                            if len(parts) == 3
                            and (t["catalog_name"], t["schema_name"],
                                 t["name"]) == tuple(parts)
                        ),
                        None,
                    )
                    if hit is None:
                        self._json(
                            404,
                            {"error_code": "TABLE_DOES_NOT_EXIST",
                             "message": full},
                        )
                    else:
                        self._json(200, hit)
                else:
                    self._json(
                        404, {"error_code": "NOT_FOUND", "message": path}
                    )

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(
            target=self._server.serve_forever, daemon=True
        ).start()
        host, bound = self._server.server_address[:2]
        return f"http://{host}:{bound}"

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None

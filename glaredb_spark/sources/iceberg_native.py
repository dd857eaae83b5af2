"""Native Iceberg table reader — no connector jar required.

Mirrors the reference's own architecture
(crates/glaredb_ext_iceberg/src/: table metadata JSON + avro manifest
parsing in the engine, then its parquet reader over the data files):
the table's metadata layer (vN.metadata.json, manifest-list avro,
manifest avro — decoded by sources/avro_lite.py) folds DRIVER-side into
an active-file list, and the actual data scan is a distributed
``spark.read.parquet`` over those files. Iceberg writes identity
partition values into the data files, so the parquet scan is
self-contained.

Metadata table functions (reference iceberg.metadata / snapshots /
manifest_list / data_files extensions; slt/iceberg/*.slt) surface the
same layers as small DataFrames with the reference's column names, and
SQL callers reach them through the table_sql pre-binder.

At 100 TB the metadata layer is KBs-to-MBs of JSON/avro (driver work,
like every Iceberg client); executors only ever see parquet splits.
Row-level deletes (position/equality, v2 ``content != 0``) are detected
and rejected with an actionable error instead of returning wrong rows.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from glaredb_spark.sources.avro_lite import read_avro

_STATUS = {0: "EXISTING", 1: "ADDED", 2: "DELETED"}
_CONTENT = {0: "DATA", 1: "POSITION_DELETES", 2: "EQUALITY_DELETES"}
_LIST_CONTENT = {0: "data", 1: "deletes"}


class IcebergError(ValueError):
    pass


def _metadata_path(table_path: str) -> str:
    mdir = os.path.join(table_path, "metadata")
    if not os.path.isdir(mdir):
        raise IcebergError(
            f"not an iceberg table (no metadata/ directory): {table_path}"
        )
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        v = open(hint).read().strip()
        for cand in (f"v{v}.metadata.json", f"{int(v):05d}.metadata.json"):
            p = os.path.join(mdir, cand)
            if os.path.exists(p):
                return p
        pref = _glob.glob(os.path.join(mdir, f"{int(v):05d}-*.metadata.json"))
        if pref:
            return pref[0]
    cands = sorted(_glob.glob(os.path.join(mdir, "*.metadata.json")))
    if not cands:
        raise IcebergError(f"no *.metadata.json under {mdir}")
    return cands[-1]


def table_metadata(table_path: str) -> dict:
    return json.load(open(_metadata_path(table_path)))


def _resolve(stored: str, meta: dict, table_path: str) -> str:
    """Stored file URI → local path (stored paths are prefixed with the
    table's logical location, which may differ from where the table
    actually sits on disk)."""
    loc = meta.get("location", "")
    for prefix in (loc, loc.removeprefix("./"), loc.removeprefix("file://")):
        if prefix and stored.startswith(prefix):
            return table_path.rstrip("/") + stored[len(prefix) :]
    # fallback: remap from the metadata/ or data/ segment (writers that
    # stored paths relative to a different working directory)
    for seg in ("/metadata/", "/data/"):
        i = stored.rfind(seg)
        if i >= 0:
            return table_path.rstrip("/") + stored[i:]
    for scheme in ("file://", "file:"):
        if stored.startswith(scheme):
            return stored[len(scheme) :]
    return stored


def _current_snapshot(meta: dict) -> dict | None:
    sid = meta.get("current-snapshot-id")
    if sid in (None, -1):
        return None
    for s in meta.get("snapshots", []):
        if s["snapshot-id"] == sid:
            return s
    return None


def _manifest_list_entries(meta: dict, table_path: str) -> list[dict]:
    snap = _current_snapshot(meta)
    if snap is None:
        return []
    if "manifest-list" in snap:
        path = _resolve(snap["manifest-list"], meta, table_path)
        recs, _ = read_avro(path)
        return recs
    # v1 tables may inline "manifests"
    return [
        {"manifest_path": p, "manifest_length": 0, "content": 0,
         "sequence_number": 0}
        for p in snap.get("manifests", [])
    ]


def _manifest_entries(meta: dict, table_path: str) -> list[dict]:
    out = []
    for ml in _manifest_list_entries(meta, table_path):
        path = _resolve(ml["manifest_path"], meta, table_path)
        recs, _ = read_avro(path)
        out.extend(recs)
    return out


# --- metadata table functions (reference column sets, slt/iceberg/) ---------


def metadata_df(spark, table_path: str):
    m = table_metadata(table_path)
    return spark.createDataFrame(
        [(int(m.get("format-version", 1)), m.get("table-uuid", ""),
          m.get("location", ""))],
        "format_version int, table_uuid string, location string",
    )


def snapshots_df(spark, table_path: str):
    m = table_metadata(table_path)
    rows = [
        (int(s["snapshot-id"]), int(s.get("sequence-number", 0)),
         s.get("manifest-list", ""))
        for s in m.get("snapshots", [])
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, sequence_number long, manifest_list string",
    )


def manifest_list_df(spark, table_path: str):
    m = table_metadata(table_path)
    rows = [
        (e["manifest_path"], int(e.get("manifest_length", 0)),
         _LIST_CONTENT.get(e.get("content", 0), "data"),
         int(e.get("sequence_number", 0)))
        for e in _manifest_list_entries(m, table_path)
    ]
    return spark.createDataFrame(
        rows,
        "manifest_path string, manifest_length long, content string,"
        " sequence_number long",
    )


def data_files_df(spark, table_path: str):
    m = table_metadata(table_path)
    rows = []
    for e in _manifest_entries(m, table_path):
        df = e["data_file"]
        rows.append(
            (
                _STATUS.get(e.get("status", 0), "EXISTING"),
                _CONTENT.get(df.get("content", 0) or 0, "DATA"),
                df["file_path"],
                df.get("file_format", "PARQUET"),
                int(df.get("record_count", 0)),
            )
        )
    return spark.createDataFrame(
        rows,
        "status string, content string, file_path string,"
        " file_format string, record_count long",
    )


# --- scan --------------------------------------------------------------------


def read_iceberg_native(spark, table_path: str):
    """Distributed scan of the table's current snapshot."""
    m = table_metadata(table_path)
    active: list[str] = []
    for e in _manifest_entries(m, table_path):
        df = e["data_file"]
        if _STATUS.get(e.get("status", 0)) == "DELETED":
            continue
        if (df.get("content", 0) or 0) != 0:
            raise IcebergError(
                "iceberg row-level deletes (position/equality) are not"
                " supported by the native reader; results would include"
                " deleted rows. Install the iceberg-spark connector jar"
                " for merge-on-read tables."
            )
        fmt = (df.get("file_format") or "PARQUET").upper()
        if fmt != "PARQUET":
            raise IcebergError(f"unsupported iceberg data file format: {fmt}")
        active.append(_resolve(df["file_path"], m, table_path))
    if not active:
        schema = _spark_schema(m)
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*active)


_PRIMITIVES = {
    "boolean": "boolean", "int": "int", "long": "long", "float": "float",
    "double": "double", "date": "date", "string": "string",
    "binary": "binary", "uuid": "string",
    "timestamp": "timestamp_ntz", "timestamptz": "timestamp",
}


def _spark_schema(meta: dict) -> str:
    """Iceberg schema JSON → Spark DDL (empty-table path only)."""
    schemas = meta.get("schemas") or [meta.get("schema", {})]
    cur = next(
        (s for s in schemas if s.get("schema-id") == meta.get("current-schema-id")),
        schemas[0],
    )
    parts = []
    for f in cur.get("fields", []):
        t = f["type"]
        if isinstance(t, str):
            base = t.split("(")[0]
            parts.append(
                f"`{f['name']}` {_PRIMITIVES.get(base, t if t.startswith('decimal') else 'string')}"
            )
        else:
            parts.append(f"`{f['name']}` string")  # nested: display-only
    return ", ".join(parts)


# --- native append writer ----------------------------------------------------

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "block_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
    ],
}

_SPARK_TO_ICE = {
    "long": "long", "bigint": "long", "int": "int", "integer": "int",
    "smallint": "int", "tinyint": "int", "string": "string",
    "double": "double", "float": "float", "boolean": "boolean",
    "date": "date", "timestamp_ntz": "timestamp", "timestamp": "timestamptz",
    "binary": "binary",
}


def _iceberg_schema(df) -> dict:
    fields = []
    for i, f in enumerate(df.schema.fields, start=1):
        s = f.dataType.simpleString()
        t = _SPARK_TO_ICE.get(s)
        if t is None and s.startswith("decimal"):
            t = s.replace("decimal", "decimal").replace(",", ", ")
        if t is None:
            raise IcebergError(
                f"cannot map Spark type {s!r} (column {f.name!r}) to an "
                "iceberg primitive for the native writer"
            )
        fields.append(
            {"id": i, "name": f.name, "required": not f.nullable, "type": t}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def write_iceberg_native(df, table_path: str) -> int:
    """Append ``df`` to an Iceberg v1 table at ``table_path`` (creating
    it if absent) without any connector jar — the writer half of this
    module's native reader (reference: glaredb_ext_iceberg is also
    read-only; we go one step further).

    Division of labor at 100 TB, same as the Delta writer: data files
    move via distributed ``df.write.parquet``; the metadata the writer
    authors (one manifest avro for the new files, a new manifest list
    carrying the previous snapshot's manifests forward, one
    metadata.json) is KB-scale driver work — record counts come from
    parquet footers, not data scans. Unpartitioned v1 append only; the
    manifest avro carries the field subset the protocol requires for a
    data scan (no column stats — readers treat missing stats as
    unpruned, which is correct, just less of an optimization).
    Returns the new snapshot id."""
    import time
    import uuid

    import pyarrow.parquet as pq

    from glaredb_spark.sources.avro_lite import write_avro

    table_path = os.path.abspath(table_path)
    mdir = os.path.join(table_path, "metadata")
    ddir = os.path.join(table_path, "data")
    os.makedirs(mdir, exist_ok=True)
    os.makedirs(ddir, exist_ok=True)

    meta = None
    if _glob.glob(os.path.join(mdir, "*.metadata.json")):
        meta = table_metadata(table_path)
        want = [
            (f["name"]) for f in (
                (meta.get("schemas") or [meta.get("schema", {})])[0]
            ).get("fields", [])
        ]
        if want != df.columns:
            raise IcebergError(
                f"schema mismatch: table columns {want}, DataFrame {df.columns}"
            )

    # each commit writes into its own unique subdir of data/ and claims
    # exactly the files it created — a concurrent writer's in-flight
    # parquet can never be attributed to this snapshot (the before/after
    # listing this replaces had that race; ADVICE r4)
    import uuid as _uuid

    sub = "c" + _uuid.uuid4().hex[:16]
    cdir = os.path.join(ddir, sub)
    df.write.mode("append").parquet(cdir)
    new_files = sorted(
        os.path.join(sub, n)
        for n in os.listdir(cdir)
        if n.endswith(".parquet")
    )

    now_ms = int(time.time() * 1000)
    prev_snaps = (meta or {}).get("snapshots", [])
    snapshot_id = 1 + max((s["snapshot-id"] for s in prev_snaps), default=0)
    seq = 1 + max((s.get("sequence-number", 0) for s in prev_snaps), default=0)

    entries = []
    added_rows = 0
    for n in new_files:
        full = os.path.join(ddir, n)
        nrows = pq.read_metadata(full).num_rows
        added_rows += nrows
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": f"{table_path}/data/{n}",
                    "file_format": "PARQUET",
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(full),
                    "block_size_in_bytes": 67108864,
                },
            }
        )
    manifest_name = f"manifest-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro"
    manifest_path = os.path.join(mdir, manifest_name)
    write_avro(manifest_path, _MANIFEST_SCHEMA, entries)

    ml_entries = []
    if meta is not None:
        for e in _manifest_list_entries(meta, table_path):
            ml_entries.append(
                {
                    "manifest_path": _resolve(
                        e["manifest_path"], meta, table_path
                    ),
                    "manifest_length": int(e.get("manifest_length", 0)),
                    "partition_spec_id": 0,
                    "added_snapshot_id": e.get("added_snapshot_id"),
                }
            )
    ml_entries.append(
        {
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "added_snapshot_id": snapshot_id,
        }
    )
    ml_name = f"snap-{snapshot_id}-{uuid.uuid4().hex[:8]}.avro"
    ml_path = os.path.join(mdir, ml_name)
    write_avro(ml_path, _MANIFEST_LIST_SCHEMA, ml_entries)

    version = 1
    if meta is not None:
        hint = os.path.join(mdir, "version-hint.text")
        if os.path.exists(hint):
            try:
                version = int(open(hint).read().strip()) + 1
            except ValueError:
                version = len(_glob.glob(os.path.join(mdir, "*.metadata.json"))) + 1
        else:
            version = len(_glob.glob(os.path.join(mdir, "*.metadata.json"))) + 1
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": ml_path,
        "summary": {
            "operation": "append",
            "added-data-files": str(len(new_files)),
            "added-records": str(added_rows),
        },
    }
    new_meta = {
        "format-version": 1,
        "table-uuid": (meta or {}).get("table-uuid", str(uuid.uuid4())),
        "location": table_path,
        "last-updated-ms": now_ms,
        "last-column-id": len(df.columns),
        "schema": _iceberg_schema(df) if meta is None else
            (meta.get("schemas") or [meta["schema"]])[0],
        "schemas": [
            _iceberg_schema(df) if meta is None else
            (meta.get("schemas") or [meta["schema"]])[0]
        ],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": prev_snaps + [snapshot],
    }
    mpath = os.path.join(mdir, f"v{version}.metadata.json")
    fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(new_meta, fh, indent=2)
    except BaseException:
        os.unlink(mpath)
        raise
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return snapshot_id

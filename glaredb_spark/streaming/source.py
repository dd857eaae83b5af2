"""Structured Streaming SOURCE over native lakehouse tables.

`readStream.format("iceberg_appends")` tails an Iceberg table's append
snapshots through the PySpark 4 Python DataSource API — the counterpart
of iceberg-spark's streaming read (reference scope: the reference
engine has no streaming at all; its iceberg extension is a batch
v1 scan, crates/glaredb_ext_iceberg). Semantics mirror iceberg-spark's
source:

- offsets are the table's monotonic SEQUENCE NUMBER — stable under
  snapshot expiration (expired snapshots only ever have older seqs);
- each micro-batch covers the snapshots with start < seq <= end;
  'append' snapshots contribute their added data files, 'replace'
  snapshots (OPTIMIZE / REORG PURGE) are reorganizations and contribute
  nothing;
- overwrite/delete snapshots RAISE by default (a row-level change
  cannot be represented in an append stream); pass
  .option("skip_non_appends", "true") for iceberg-spark's
  streaming-skip-overwrite-snapshots behavior (documented data loss:
  their added files are skipped too).

Scale: offset resolution and partition planning are KB-scale driver
metadata reads; the DATA moves entirely on executors — one input
partition per data file, read with pyarrow and handed to Spark as Arrow
record batches (null-filling added columns and upcasting widened types
against the table's current schema). No driver row movement, unlike
SimpleDataSourceStreamReader.

Usage:
    from glaredb_spark.streaming.source import register_stream_sources
    register_stream_sources(spark)
    df = (spark.readStream.format("iceberg_appends")
          .option("path", table_path).load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _pv_literal(raw, dt):
    """Delta partitionValues string -> typed python value (spec
    serialization: plain numbers, ISO dates, 'true'/'false')."""
    import datetime
    import decimal

    from pyspark.sql import types as T

    if raw is None:
        return None
    if isinstance(dt, T.StringType):
        return raw
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int(raw)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(raw)
    if isinstance(dt, T.BooleanType):
        return str(raw).lower() == "true"
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(raw)
    if isinstance(dt, T.DecimalType):
        return decimal.Decimal(raw)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(raw)
    raise ValueError(
        f"unsupported partition column type {dt.simpleString()!r}"
    )


def _read_file_as_batches(spec: dict):
    """Executor-side: one data file -> Arrow batches conforming to the
    table schema (by-name projection — through the physical-name map on
    column-mapped Delta — null-fill for columns added after the file
    was written, constant fill for hive-style partition columns, cast
    for widened types)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import StructType

    # StructType JSON, not a DDL string: DDL parsing needs an active
    # SparkSession, which executors don't have
    st = StructType.fromJson(json.loads(spec["schema"]))
    phys = spec.get("phys") or {}
    pv = spec.get("pv") or {}
    tbl = pq.read_table(spec["file"])
    cols = []
    fields = []
    for f in st.fields:
        at = to_arrow_type(f.dataType)
        name = phys.get(f.name, f.name)
        if f.name in pv:
            lit = _pv_literal(pv[f.name], f.dataType)
            col = pa.nulls(tbl.num_rows, at) if lit is None else pa.array(
                [lit] * tbl.num_rows, type=at
            )
        elif name in tbl.column_names:
            col = tbl.column(name)
            if col.type != at:
                col = col.cast(at)
        else:
            col = pa.nulls(tbl.num_rows, at)
        cols.append(col)
        fields.append(pa.field(f.name, at, True))
    out = pa.table(cols, schema=pa.schema(fields))
    yield from out.to_batches(max_chunksize=8192)


class _IcebergAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, schema_json: str, options: dict):
        self._path = os.path.abspath(options["path"])
        self._schema_json = schema_json
        self._skip = str(
            options.get("skip_non_appends", "false")
        ).lower() == "true"

    # -- offset bookkeeping (KB-scale driver metadata reads) -----------

    def _snapshots(self):
        from glaredb_spark.sources.iceberg_native import (
            IcebergError,
            _sorted_snapshots,
            table_metadata,
        )

        meta = table_metadata(self._path)
        snaps = _sorted_snapshots(meta)
        if any(s.get("sequence-number") is None for s in snaps):
            # ANY seq-less snapshot is refused, not just all-seq-less:
            # a v1->v2 upgraded external table has seq-less old
            # snapshots that would coerce to 0 and silently fall out of
            # every (lo, hi] offset range — the exact silent-data-loss
            # class this guard exists for (r10 reviews #5 and #10).
            # This writer stamps sequence-number on v1 metadata too.
            raise IcebergError(
                "cannot stream a table with snapshots that have no "
                "sequence numbers (external format-version 1 metadata)"
            )
        return meta, snaps

    def initialOffset(self) -> dict:
        return {"seq": 0, "snapshot_id": None}

    def latestOffset(self) -> dict:
        _meta, snaps = self._snapshots()
        if not snaps:
            return {"seq": 0, "snapshot_id": None}
        last = snaps[-1]
        return {
            "seq": int(last.get("sequence-number", 0) or 0),
            "snapshot_id": int(last["snapshot-id"]),
        }

    def partitions(self, start: dict, end: dict):
        from glaredb_spark.sources.avro_lite import read_avro
        from glaredb_spark.sources.iceberg_native import (
            IcebergError,
            _manifest_list_entries,
            _renamed_or_dropped,
            _resolve,
            _STATUS,
        )

        lo, hi = int(start["seq"]), int(end["seq"])
        meta, snaps = self._snapshots()
        if _renamed_or_dropped(meta):
            marker = (meta.get("properties") or {}).get(
                "glaredb.evolution-dirty-seq"
            )
            dirty = int(marker) if marker is not None else 10**18
        else:
            dirty = -1
        in_range = [
            s for s in snaps
            if lo < int(s.get("sequence-number", 0) or 0) <= hi
        ]
        # gap detection (r10 review #2): snapshots expired between runs
        # must fail the stream, not silently drop their rows — the
        # parent chain proves continuity (the Delta twin raises on a
        # missing commit file; this is the iceberg equivalent).
        prev_sid = start.get("snapshot_id")
        retained = {int(x["snapshot-id"]) for x in snaps}
        first_check = prev_sid is not None or lo <= 0
        for s in in_range:
            par = s.get("parent-snapshot-id")
            if prev_sid is None:
                # prev_sid None with lo>0 = an offset that predates the
                # snapshot_id field: the parent may be a legitimately
                # expired ALREADY-CONSUMED snapshot, so only the
                # intra-range chain is verifiable (r10 review)
                if first_check and par is not None \
                        and int(par) not in retained:
                    raise IcebergError(
                        f"snapshot {s['snapshot-id']}'s predecessor has "
                        "been expired — its appends cannot be replayed "
                        "from the stream start"
                    )
            elif par is not None and int(par) != int(prev_sid):
                raise IcebergError(
                    f"snapshots between {prev_sid} and "
                    f"{s['snapshot-id']} have been expired — the "
                    "stream has an unrecoverable gap"
                )
            prev_sid = int(s["snapshot-id"])
        out = []
        for s in in_range:
            sid = int(s["snapshot-id"])
            seq = int(s.get("sequence-number", 0) or 0)
            op = (s.get("summary") or {}).get("operation", "")
            if op == "replace":
                continue  # reorganization: no new rows
            if op not in ("append",):
                if self._skip:
                    continue
                raise IcebergError(
                    f"snapshot {sid} is a {op!r} — an append stream "
                    "cannot represent row-level changes; use "
                    "iceberg.changes for a changelog, or set "
                    "skip_non_appends=true to drop such snapshots"
                )
            if seq <= dirty:
                raise IcebergError(
                    f"snapshot {sid} predates a RENAME/DROP COLUMN; "
                    "stream from a snapshot after OPTIMIZE normalized "
                    "the table"
                )
            # only manifests this snapshot ADDED can contain its new
            # files — skipping carried-forward manifests keeps planning
            # O(new manifests), not O(snapshots x total manifests)
            # (r10 review #7)
            for ml in _manifest_list_entries(meta, self._path, sid):
                if int(ml.get("added_snapshot_id") or 0) != sid:
                    continue
                if int(ml.get("content", 0) or 0) != 0:
                    continue  # delete manifests
                recs, _sch = read_avro(
                    _resolve(ml["manifest_path"], meta, self._path)
                )
                for e in recs:
                    if _STATUS.get(e.get("status", 0)) != "ADDED":
                        continue
                    esid = e.get("snapshot_id")
                    # null snapshot_id inherits the adding snapshot
                    # (v2 inheritance — external writers rely on it;
                    # r10 review #1)
                    if esid is not None and int(esid) != sid:
                        continue
                    d = e["data_file"]
                    if (d.get("content", 0) or 0) != 0:
                        continue
                    out.append(InputPartition(json.dumps({
                        "file": _resolve(
                            d["file_path"], meta, self._path
                        ),
                        "schema": self._schema_json,
                    })))
        return out

    def read(self, partition: InputPartition):
        yield from _read_file_as_batches(json.loads(partition.value))

    def commit(self, end: dict) -> None:
        pass


class IcebergAppendsDataSource(DataSource):
    """spark.readStream.format("iceberg_appends").option("path", p)"""

    @classmethod
    def name(cls) -> str:
        return "iceberg_appends"

    def schema(self) -> str:
        from glaredb_spark.sources.iceberg_native import (
            _spark_schema,
            table_metadata,
        )

        return _spark_schema(table_metadata(self.options["path"]))

    def streamReader(self, schema):
        # ship the schema as StructType JSON: executors reconstruct it
        # without a SparkSession (DDL parsing would need one)
        return _IcebergAppendsStreamReader(
            schema.json(), dict(self.options)
        )


class _DeltaAppendsStreamReader(DataSourceStreamReader):
    """Offsets are commit VERSIONS; each micro-batch covers commits
    (start, end] — append commits (adds only, dataChange) contribute
    their files; commits that REMOVE data files fail the stream (or
    skip with skip_non_appends=true); metadata-only commits are
    silent. Column-mapped tables project through the physical-name map
    and partition columns constant-fill from partitionValues — all on
    executors."""

    def __init__(self, schema_json: str, options: dict):
        self._path = os.path.abspath(options["path"])
        self._schema_json = schema_json
        self._skip = str(
            options.get("skip_non_appends", "false")
        ).lower() == "true"

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        from glaredb_spark.sources.delta_native import _latest_version

        latest = _latest_version(os.path.join(self._path, "_delta_log"))
        return {"version": -1 if latest is None else int(latest)}

    def partitions(self, start: dict, end: dict):
        import urllib.parse

        from glaredb_spark.sources.delta_native import (
            _mapping_mode,
            _physical_map,
            load_delta_state,
        )

        lo, hi = int(start["version"]), int(end["version"])
        state = load_delta_state(self._path, version=hi)
        phys = (
            _physical_map(state)
            if _mapping_mode(state) != "none" else {}
        )
        part_cols = list(state.partition_columns)
        pc_phys = {phys.get(c, c): c for c in part_cols}
        log_dir = os.path.join(self._path, "_delta_log")
        out = []
        for ver in range(lo + 1, hi + 1):
            commit = os.path.join(log_dir, f"{ver:020d}.json")
            if not os.path.exists(commit):
                raise RuntimeError(
                    f"commit {ver} is no longer in the log (checkpoint "
                    "cleanup) — its appends cannot be replayed"
                )
            adds, removed = [], False
            with open(commit) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "add" in a and a["add"].get("dataChange", True):
                        adds.append(a["add"])
                    elif "remove" in a and a["remove"].get(
                        "dataChange", True
                    ):
                        removed = True
            if removed:
                if self._skip:
                    continue
                raise RuntimeError(
                    f"commit {ver} removed data files — an append "
                    "stream cannot represent row-level changes; use "
                    "delta.changes for a changelog, or set "
                    "skip_non_appends=true"
                )
            for a in adds:
                rel = urllib.parse.unquote(a["path"])
                pv_raw = a.get("partitionValues") or {}
                # partitionValues are keyed by PHYSICAL name on mapped
                # tables; the reader wants logical keys
                pv = {
                    pc_phys.get(k, k): v for k, v in pv_raw.items()
                    if pc_phys.get(k, k) in part_cols
                }
                out.append(InputPartition(json.dumps({
                    "file": os.path.join(self._path, rel),
                    "schema": self._schema_json,
                    "phys": phys,
                    "pv": pv,
                })))
        return out

    def read(self, partition: InputPartition):
        yield from _read_file_as_batches(json.loads(partition.value))

    def commit(self, end: dict) -> None:
        pass


class DeltaAppendsDataSource(DataSource):
    """spark.readStream.format("delta_appends").option("path", p)"""

    @classmethod
    def name(cls) -> str:
        return "delta_appends"

    def schema(self) -> str:
        import json as _json

        from pyspark.sql.types import StructType

        from glaredb_spark.sources.delta_native import load_delta_state

        state = load_delta_state(self.options["path"])
        st = StructType.fromJson(_json.loads(state.schema_json))
        return ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields
        )

    def streamReader(self, schema):
        return _DeltaAppendsStreamReader(
            schema.json(), dict(self.options)
        )


def register_stream_sources(spark) -> None:
    """Register the lakehouse streaming sources on this session."""
    spark.dataSource.register(IcebergAppendsDataSource)
    spark.dataSource.register(DeltaAppendsDataSource)

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


def _const_array(name: str, v, dt, n: int):
    """Constant column for change-metadata fields (executor-side)."""
    import datetime

    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    at = to_arrow_type(dt)
    if v is None:
        return pa.nulls(n, at), at
    if name == "_commit_timestamp":
        v = datetime.datetime.fromtimestamp(
            v / 1000.0, datetime.timezone.utc
        )
    return pa.array([v] * n, type=at), at


def _conform_table(tbl, st, phys: dict, pv: dict, consts: dict):
    """pyarrow table -> columns of ``st`` (by-name projection through
    the physical map, partition-value / change-metadata constant fill,
    null-fill for later-added columns, cast for widened types)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    cols = []
    fields = []
    for f in st.fields:
        name = phys.get(f.name, f.name)
        if f.name in consts:
            col, at = _const_array(
                f.name, consts[f.name], f.dataType, tbl.num_rows
            )
        elif f.name in pv:
            at = to_arrow_type(f.dataType)
            lit = _pv_literal(pv[f.name], f.dataType)
            col = pa.nulls(tbl.num_rows, at) if lit is None else pa.array(
                [lit] * tbl.num_rows, type=at
            )
        elif name in tbl.column_names:
            at = to_arrow_type(f.dataType)
            col = tbl.column(name)
            if col.type != at:
                col = col.cast(at)
        else:
            at = to_arrow_type(f.dataType)
            col = pa.nulls(tbl.num_rows, at)
        cols.append(col)
        fields.append(pa.field(f.name, at, True))
    return pa.table(cols, schema=pa.schema(fields))


def _read_file_as_batches(spec: dict):
    """Executor-side: one data file -> Arrow batches conforming to the
    table schema (by-name projection — through the physical-name map on
    column-mapped Delta — null-fill for columns added after the file
    was written, constant fill for hive-style partition columns and for
    change-metadata constants, cast for widened types)."""
    import pyarrow.parquet as pq

    from pyspark.sql.types import StructType

    # StructType JSON, not a DDL string: DDL parsing needs an active
    # SparkSession, which executors don't have
    st = StructType.fromJson(json.loads(spec["schema"]))
    out = _conform_table(
        pq.read_table(spec["file"]), st,
        spec.get("phys") or {}, spec.get("pv") or {},
        spec.get("consts") or {},
    )
    yield from out.to_batches(max_chunksize=8192)


def _mor_visible_mask(df, spec: dict, pos_paths: list, eq_specs: list):
    """Boolean visibility mask for data file rows under the given
    position/equality delete files — the per-file core of MoR
    (iceberg_native._mor_apply's semantics, restricted to one data
    file so it runs executor-side with no joins):

    - position deletes name (file_path, pos) — rows of THIS file drop
      by ordinal;
    - equality deletes drop rows whose key columns match any key row,
      when the delete's sequence is strictly newer than the data file's
      (seq<=0 deletes apply unconditionally) and the partition scopes
      agree — pandas merge treats NaN==NaN on join keys, matching the
      batch reader's eqNullSafe.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    n = df.shape[0]
    mask = np.ones(n, dtype=bool)
    stored = spec["stored"]
    for p in pos_paths:
        pd_tbl = pq.read_table(p, columns=["file_path", "pos"]).to_pandas()
        hits = pd_tbl.loc[pd_tbl["file_path"] == stored, "pos"]
        if len(hits):
            idx = hits.to_numpy(dtype=np.int64)
            mask[idx[idx < n]] = False
    for e in eq_specs:
        if not (int(e["seq"]) <= 0 or int(spec["seq"]) < int(e["seq"])):
            continue  # strictly-older-data-files rule
        if e.get("scope") and spec.get("scope") and \
                e["scope"] != spec["scope"]:
            continue  # partition-scoped delete, different partition
        keys = pq.read_table(e["path"]).to_pandas()
        cols = e.get("cols") or [
            c for c in keys.columns if c in df.columns
        ]
        if not cols:
            raise RuntimeError(
                f"equality delete file {e['path']!r} shares no columns "
                "with the table schema"
            )
        keys = keys[cols].drop_duplicates()
        hit = (
            df[cols]
            .merge(keys.assign(_hit=1), on=cols, how="left")["_hit"]
            .notna()
            .to_numpy()
        )
        mask &= ~hit
    return mask


def _read_mor_diff_as_batches(spec: dict):
    """Executor-side: rows of ONE data file newly deleted by a
    snapshot's delete files = (visible under the PRIOR delete set) and
    not (visible under the CURRENT delete set). With emit_all_visible
    (the file itself was removed) every prior-visible row is a delete.
    Runs entirely in this partition: the data file plus the (small)
    delete files it may be subject to."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.types import StructType

    st = StructType.fromJson(json.loads(spec["schema"]))
    tbl = pq.read_table(spec["file"])
    df = tbl.to_pandas(types_mapper=None)
    old = _mor_visible_mask(
        df, spec, spec.get("old_pos") or [], spec.get("old_eq") or []
    )
    if spec.get("emit_all_visible"):
        deleted = old
    else:
        new = old.copy()
        new &= _mor_visible_mask(
            df, spec, spec.get("new_pos") or [], spec.get("new_eq") or []
        )
        deleted = old & ~new
    if not deleted.any():
        return
    picked = tbl.filter(pa.array(deleted))
    out = _conform_table(
        picked, st, {}, {}, spec.get("consts") or {}
    )
    yield from out.to_batches(max_chunksize=8192)


def _gap_checked_range(snaps: list, start: dict, lo: int, hi: int,
                       what: str) -> list:
    """Snapshots with lo < seq <= hi, gap-checked: snapshots expired
    between runs must FAIL the stream, not silently drop their rows —
    the parent chain proves continuity (r10 review #2; the Delta twin
    raises on a missing commit file)."""
    from glaredb_spark.sources.iceberg_native import IcebergError

    in_range = [
        s for s in snaps
        if lo < int(s.get("sequence-number", 0) or 0) <= hi
    ]
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
                    f"been expired — its {what} cannot be replayed "
                    "from the stream start"
                )
        elif par is not None and int(par) != int(prev_sid):
            raise IcebergError(
                f"snapshots between {prev_sid} and "
                f"{s['snapshot-id']} have been expired — the "
                "stream has an unrecoverable gap"
            )
        prev_sid = int(s["snapshot-id"])
    return in_range


def iceberg_meta_for_options(options: dict) -> tuple[dict, str]:
    """(metadata document, table location) for a source's options —
    path-addressed (``path``) or catalog-addressed (r12:
    ``endpoint`` + ``table`` ['ns.name'] [+ ``token``], resolved
    through the Iceberg REST catalog per call so the stream follows
    catalog commits, which real catalogs do NOT mirror into a
    filesystem version hint)."""
    if options.get("endpoint"):
        from glaredb_spark.sources.iceberg_rest import (
            _strip_file,
            load_table,
            resolve_auth,
        )

        full = options.get("table") or ""
        ns, _, tbl = full.rpartition(".")
        if not ns:
            raise ValueError(
                "catalog-addressed stream needs table='namespace.name'"
            )
        # token-expiry-aware (r15, VERDICT r14 #4): a ``credential``
        # option re-exchanges through the expiry-aware OAuth cache at
        # EVERY planning call, so a stream outliving its bearer's TTL
        # keeps running; a static ``token`` is used as-is. A 401 on a
        # cached bearer (server-side revocation before the cache
        # expires) invalidates + re-exchanges ONCE — a stream poll
        # must not die on a refreshable token.
        from glaredb_spark.sources.iceberg_rest import (
            IcebergRestError,
            invalidate_token,
        )

        cred = options.get("credential")
        tok = resolve_auth(options["endpoint"], options.get("token"), cred)
        try:
            res = load_table(options["endpoint"], ns, tbl, tok)
        except IcebergRestError as e:
            if not (cred and getattr(e, "code", 0) == 401):
                raise
            invalidate_token(options["endpoint"], cred)
            tok = resolve_auth(options["endpoint"], None, cred)
            res = load_table(options["endpoint"], ns, tbl, tok)
        meta = res.get("metadata") or {}
        loc = _strip_file(meta.get("location") or "")
        if not meta or not loc:
            raise ValueError(
                f"loadTable for {full} returned no metadata/location"
            )
        return meta, loc
    from glaredb_spark.sources.iceberg_native import table_metadata

    p = os.path.abspath(options["path"])
    return table_metadata(p), p


class _IcebergAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, schema_json: str, options: dict):
        self._options = dict(options)
        # lazy: every offset/partition call re-resolves through
        # _snapshots() anyway (and sets _path); an eager loadTable here
        # was a third catalog round-trip before the first batch
        # (r12 review pass 2)
        self._path = (
            os.path.abspath(options["path"])
            if options.get("path") else None
        )
        self._schema_json = schema_json
        self._skip = str(
            options.get("skip_non_appends", "false")
        ).lower() == "true"

    # -- offset bookkeeping (KB-scale driver metadata reads) -----------

    def _snapshots(self):
        from glaredb_spark.sources.iceberg_native import (
            IcebergError,
            _sorted_snapshots,
        )

        meta, self._path = iceberg_meta_for_options(self._options)
        snaps = _sorted_snapshots(meta)
        ref = self._options.get("ref")
        if ref:
            # stream a TAG/BRANCH (r14): only snapshots on the ref's
            # ANCESTRY chain participate — a dead branch (a rollback's
            # abandoned tip, another branch's appends) never enters the
            # offset range, so the chain-gap validation holds by
            # construction. ref='main' streams the current lineage —
            # the rollback-safe form of the default seq-range stream.
            from glaredb_spark.sources.iceberg_native import (
                resolve_ref_iceberg_native,
            )

            cur0 = meta.get("current-snapshot-id")
            if ref == "main" and (cur0 is None or int(cur0) == -1):
                snaps = []  # empty table: no lineage yet, not an error
            else:
                head = resolve_ref_iceberg_native(meta, ref)
                by_id = {
                    int(s.get("snapshot-id", 0) or 0): s for s in snaps
                }
                keep: set = set()
                cur = head
                while cur is not None and int(cur) in by_id:
                    keep.add(int(cur))
                    cur = by_id[int(cur)].get("parent-snapshot-id")
                snaps = [
                    s for s in snaps
                    if int(s.get("snapshot-id", 0) or 0) in keep
                ]
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
        in_range = _gap_checked_range(snaps, start, lo, hi, "appends")
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
    """spark.readStream.format("iceberg_appends").option("path", p),
    or catalog-addressed (r12): .option("endpoint", url)
    .option("table", "ns.name") [.option("token", t)]"""

    @classmethod
    def name(cls) -> str:
        return "iceberg_appends"

    def schema(self) -> str:
        from glaredb_spark.sources.iceberg_native import _spark_schema

        meta, _loc = iceberg_meta_for_options(dict(self.options))
        return _spark_schema(meta)

    def streamReader(self, schema):
        # ship the schema as StructType JSON: executors reconstruct it
        # without a SparkSession (DDL parsing would need one)
        return _IcebergAppendsStreamReader(
            schema.json(), dict(self.options)
        )


class _IcebergChangesStreamReader(_IcebergAppendsStreamReader):
    """Changelog stream: each micro-batch surfaces the _change_type
    rows of the covered snapshots — inserts from added data files,
    deletes from per-file MoR before/after diffs (position/equality
    delete files apply within each candidate file's partition, so the
    diff needs NO join). COW rewrites (adds+removes of data files in
    one snapshot) are underivable per-file and FAIL the stream —
    batch iceberg.changes computes those with an exceptAll; MoR DML
    keeps a table streamable. Offsets/gap-honesty are the appends
    reader's (sequence numbers; expired snapshots raise)."""

    def __init__(self, schema_json: str, options: dict):
        super().__init__(schema_json, options)
        self._start_seq = int(options.get("starting_seq", 0))

    def initialOffset(self) -> dict:
        return {"seq": self._start_seq, "snapshot_id": None}

    def partitions(self, start: dict, end: dict):
        from glaredb_spark.sources.iceberg_native import (
            IcebergError,
            _renamed_or_dropped,
            _snapshot_file_sets,
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
        in_range = _gap_checked_range(snaps, start, lo, hi, "changes")
        if not in_range:
            return []
        ids = [int(s["snapshot-id"]) for s in snaps]
        first_idx = ids.index(int(in_range[0]["snapshot-id"]))
        if first_idx == 0:
            # oldest retained snapshot: change derivation needs its
            # PARENT's file sets. A parent-less snapshot is the table's
            # true first commit (empty prev is exact); a parent that was
            # expired — even an already-consumed one the appends reader
            # may skip past — makes the before-image unrecoverable, so
            # the changes stream must FAIL, not re-emit inherited rows
            # as inserts (r11 review #1)
            par = in_range[0].get("parent-snapshot-id")
            if par is not None:
                raise IcebergError(
                    f"snapshot {in_range[0]['snapshot-id']}'s parent "
                    f"{par} has been expired — its changes cannot be "
                    "derived (the prior file set is unrecoverable)"
                )
            prev = ({}, {})
        else:
            prev = _snapshot_file_sets(
                meta, self._path, ids[first_idx - 1], with_counts=True
            )

        def _split_dels(dels: dict):
            pos = [r for (r, _q, _pt, c, _e) in dels.values() if c == 1]
            eq = [
                {"path": r, "seq": q, "scope": pt or "",
                 "cols": self._eq_cols(meta, e)}
                for (r, q, pt, c, e) in dels.values() if c == 2
            ]
            return pos, eq

        out = []
        for s in in_range:
            sid = int(s["snapshot-id"])
            seq = int(s.get("sequence-number", 0) or 0)
            ts_ms = int(s.get("timestamp-ms", 0) or 0)
            op = (s.get("summary") or {}).get("operation", "")
            data_p, dels_p = prev
            data_s, dels_s = _snapshot_file_sets(
                meta, self._path, sid, with_counts=True
            )
            prev = (data_s, dels_s)
            if op == "replace":
                continue  # reorganization: visible rows unchanged
            added_data = {
                k: v for k, v in data_s.items()
                # empty replacement files (a COW DELETE that left no
                # survivors still stages one) carry no change rows and
                # must not flag the snapshot as a rewrite
                if k not in data_p and v[3] > 0
            }
            removed_data = {
                k: v for k, v in data_p.items() if k not in data_s
            }
            added_dels = {
                k: v for k, v in dels_s.items() if k not in dels_p
            }
            touched = [v[1] for v in added_data.values()]
            touched += [v[1] for v in removed_data.values()]
            touched += [v[1] for v in added_dels.values()]
            if any(q <= dirty for q in touched):
                raise IcebergError(
                    f"snapshot {sid} touches files predating a RENAME/"
                    "DROP COLUMN; stream from a snapshot after OPTIMIZE "
                    "normalized the table"
                )
            consts_del = {
                "_change_type": "delete",
                "_commit_snapshot_id": sid,
                "_commit_timestamp": ts_ms,
            }
            consts_ins = dict(consts_del, _change_type="insert")
            if added_dels and removed_data:
                raise IcebergError(
                    f"snapshot {sid} ({op!r}) both removed data files "
                    "and added delete files — its row-level changes "
                    "cannot be derived from manifests"
                )
            if added_data and removed_data:
                raise IcebergError(
                    f"snapshot {sid} ({op!r}) rewrote files copy-on-"
                    "write — the row diff needs a cross-file "
                    "comparison; use batch iceberg.changes, or keep "
                    "the table streamable with merge-on-read DML"
                )
            if added_dels:
                old_pos, old_eq = _split_dels(dels_p)
                new_pos, new_eq = _split_dels(added_dels)
                max_seq = max(
                    q for (_r, q, _pt, _c, _e) in added_dels.values()
                )
                if any(
                    v[1] <= dirty for v in data_p.values()
                    if v[1] <= max_seq
                ) or any(v[1] <= dirty for v in dels_p.values()):
                    raise IcebergError(
                        f"snapshot {sid}'s deletes touch files "
                        "predating a RENAME/DROP COLUMN; stream from a "
                        "snapshot after OPTIMIZE"
                    )
                for stored, (res, fseq, scope, rc) in data_p.items():
                    if fseq > max_seq or rc == 0:
                        continue  # new deletes can't touch newer files
                    out.append(InputPartition(json.dumps({
                        "kind": "mor_diff", "file": res,
                        "stored": stored, "seq": fseq,
                        "scope": scope or "",
                        "schema": self._schema_json,
                        "old_pos": old_pos, "old_eq": old_eq,
                        "new_pos": new_pos, "new_eq": new_eq,
                        "consts": consts_del,
                    })))
            elif removed_data:
                if any(v[1] <= dirty for v in dels_p.values()):
                    raise IcebergError(
                        f"snapshot {sid}'s removals apply delete files "
                        "predating a RENAME/DROP COLUMN; stream from a "
                        "snapshot after OPTIMIZE"
                    )
                old_pos, old_eq = _split_dels(dels_p)
                for stored, (res, fseq, scope, rc) in \
                        removed_data.items():
                    if rc == 0:
                        continue  # empty file: nothing was visible
                    out.append(InputPartition(json.dumps({
                        "kind": "mor_diff", "file": res,
                        "stored": stored, "seq": fseq,
                        "scope": scope or "",
                        "schema": self._schema_json,
                        "old_pos": old_pos, "old_eq": old_eq,
                        "emit_all_visible": True,
                        "consts": consts_del,
                    })))
            for _stored, (res, _fseq, _scope, _rc) in added_data.items():
                out.append(InputPartition(json.dumps({
                    "file": res, "schema": self._schema_json,
                    "consts": consts_ins,
                })))
        return out

    @staticmethod
    def _eq_cols(meta: dict, eq_ids) -> "list | None":
        from glaredb_spark.sources.iceberg_native import (
            _schema_field_names,
        )

        if not eq_ids:
            return None  # executor intersects file columns with schema
        names = _schema_field_names(meta)
        return [names[i] for i in eq_ids if i in names]

    def read(self, partition: InputPartition):
        spec = json.loads(partition.value)
        if spec.get("kind") == "mor_diff":
            yield from _read_mor_diff_as_batches(spec)
        else:
            yield from _read_file_as_batches(spec)


class IcebergChangesDataSource(DataSource):
    """spark.readStream.format("iceberg_changes").option("path", p) —
    the streaming form of the batch iceberg.changes TVF
    (changes_iceberg_native): table columns + _change_type /
    _commit_snapshot_id / _commit_timestamp per micro-batch. Options:
    starting_seq=N streams changes with sequence-number > N (default 0
    = full retained history)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_changes"

    def schema(self) -> str:
        from glaredb_spark.sources.iceberg_native import _spark_schema

        meta, _loc = iceberg_meta_for_options(dict(self.options))
        base = _spark_schema(meta)
        return (
            f"{base}, `_change_type` string, "
            "`_commit_snapshot_id` bigint, `_commit_timestamp` timestamp"
        )

    def streamReader(self, schema):
        return _IcebergChangesStreamReader(
            schema.json(), dict(self.options)
        )


def delta_path_for_options(options: dict) -> str:
    """Table path for a Delta source's options — path-addressed
    (``path``) or Unity-catalog-addressed (r12: ``endpoint`` +
    ``table`` ['catalog.schema.table']). Unity's storage_location is
    static per table and the transaction log at that path IS the
    source of truth, so one resolution at stream start suffices
    (unlike the Iceberg REST pointer, which moves per commit)."""
    if options.get("endpoint"):
        from glaredb_spark.sources.unity import UnityError, table_info

        full = options.get("table") or ""
        parts = full.split(".")
        if len(parts) != 3:
            raise ValueError(
                "unity-addressed stream needs "
                "table='catalog.schema.table'"
            )
        info = table_info(options["endpoint"], *parts)
        fmt = (info.get("data_source_format") or "DELTA").upper()
        if fmt != "DELTA":
            raise UnityError(
                f"cannot stream {full}: data_source_format {fmt}"
            )
        loc = info.get("storage_location") or ""
        if loc.startswith("file://"):
            loc = loc[len("file://"):]
        if not loc:
            raise UnityError(f"table {full} has no storage_location")
        return loc
    return os.path.abspath(options["path"])


class _DeltaAppendsStreamReader(DataSourceStreamReader):
    """Offsets are commit VERSIONS; each micro-batch covers commits
    (start, end] — append commits (adds only, dataChange) contribute
    their files; commits that REMOVE data files fail the stream (or
    skip with skip_non_appends=true); metadata-only commits are
    silent. Column-mapped tables project through the physical-name map
    and partition columns constant-fill from partitionValues — all on
    executors."""

    def __init__(self, schema_json: str, options: dict):
        self._path = delta_path_for_options(options)
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

        state = load_delta_state(
            delta_path_for_options(dict(self.options))
        )
        st = StructType.fromJson(_json.loads(state.schema_json))
        return ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields
        )

    def streamReader(self, schema):
        return _DeltaAppendsStreamReader(
            schema.json(), dict(self.options)
        )


class _DeltaChangesStreamReader(DataSourceStreamReader):
    """Change Data Feed stream: offsets are commit versions; each
    micro-batch surfaces the CDF rows of commits (start, end] — spec
    `cdc` actions replay verbatim (they carry _change_type, including
    update_preimage/postimage), commits without cdc derive blind
    appends (adds -> insert) and blind deletes (removes -> delete); a
    commit that rewrote files without change data raises, exactly like
    the batch delta.changes reader (table_changes_delta_native).
    Column-mapped tables demap physical->logical on executors."""

    def __init__(self, schema_json: str, options: dict):
        self._path = delta_path_for_options(options)
        self._schema_json = schema_json
        self._start_ver = int(options.get("starting_version", -1))

    def initialOffset(self) -> dict:
        return {"version": self._start_ver}

    def latestOffset(self) -> dict:
        from glaredb_spark.sources.delta_native import _latest_version

        latest = _latest_version(os.path.join(self._path, "_delta_log"))
        return {"version": -1 if latest is None else int(latest)}

    def partitions(self, start: dict, end: dict):
        import urllib.parse

        from glaredb_spark.sources.delta_native import (
            _mapping_mode,
            _partition_values_from_path,
            _physical_map,
            load_delta_state,
        )

        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        state = load_delta_state(self._path, version=hi)
        phys = (
            _physical_map(state)
            if _mapping_mode(state) != "none" else {}
        )
        part_cols = list(state.partition_columns)
        pc_phys = [phys.get(c, c) for c in part_cols]
        log_dir = os.path.join(self._path, "_delta_log")
        out = []
        for ver in range(lo + 1, hi + 1):
            commit = os.path.join(log_dir, f"{ver:020d}.json")
            if not os.path.exists(commit):
                raise RuntimeError(
                    f"commit {ver} is no longer in the log (checkpoint "
                    "cleanup) — its changes cannot be replayed"
                )
            cdc, adds, removes, ts_ms = [], [], [], None
            with open(commit) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "commitInfo" in a:
                        ts_ms = a["commitInfo"].get("timestamp")
                    elif "cdc" in a:
                        cdc.append(a["cdc"])
                    elif "add" in a and a["add"].get("dataChange", True):
                        adds.append(a["add"])
                    elif "remove" in a and a["remove"].get(
                        "dataChange", True
                    ):
                        removes.append(a["remove"])
            if ts_ms is None:
                ts_ms = int(os.stat(commit).st_mtime * 1000)
            consts = {
                "_commit_version": ver, "_commit_timestamp": ts_ms,
            }

            def _emit(actions, ctype: "str | None") -> None:
                for a in actions:
                    rel = urllib.parse.unquote(a["path"])
                    full = os.path.join(self._path, rel)
                    if not os.path.exists(full):
                        raise RuntimeError(
                            f"commit {ver}: changed file {rel!r} no "
                            "longer exists (VACUUMed past retention) — "
                            "start the stream at a later version"
                        )
                    pv_raw = a.get("partitionValues")
                    if pv_raw is None and part_cols:
                        # remove actions may omit partitionValues — the
                        # hive-style path carries them (physical names)
                        pv_raw = _partition_values_from_path(
                            rel, pc_phys
                        )
                    pv = {
                        c: (pv_raw or {}).get(p)
                        for c, p in zip(part_cols, pc_phys)
                    }
                    spec = {
                        "file": full, "schema": self._schema_json,
                        "phys": phys, "pv": pv,
                        "consts": (
                            dict(consts, _change_type=ctype)
                            if ctype is not None else consts
                        ),
                    }
                    out.append(InputPartition(json.dumps(spec)))

            if cdc:
                # cdc files carry their own _change_type column;
                # same-commit add/remove actions are the table
                # maintenance side of the DML and must NOT double-emit
                _emit(cdc, None)
                continue
            if adds and removes:
                raise RuntimeError(
                    f"commit {ver} rewrote files without change data "
                    "(no cdc actions) — its row-level changes cannot "
                    "be derived; enable CDF "
                    "(delta.enableChangeDataFeed) before DML or start "
                    "the stream after it"
                )
            _emit(adds, "insert")
            _emit(removes, "delete")
        return out

    def read(self, partition: InputPartition):
        yield from _read_file_as_batches(json.loads(partition.value))

    def commit(self, end: dict) -> None:
        pass


class DeltaChangesDataSource(DataSource):
    """spark.readStream.format("delta_changes").option("path", p) —
    the streaming form of delta-spark's readChangeFeed: table columns
    + _change_type / _commit_version / _commit_timestamp per
    micro-batch. Options: starting_version=N streams commits > N
    (default -1 = the full retained log)."""

    @classmethod
    def name(cls) -> str:
        return "delta_changes"

    def schema(self) -> str:
        import json as _json

        from pyspark.sql.types import StructType

        from glaredb_spark.sources.delta_native import load_delta_state

        state = load_delta_state(
            delta_path_for_options(dict(self.options))
        )
        st = StructType.fromJson(_json.loads(state.schema_json))
        base = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields
        )
        return (
            f"{base}, `_change_type` string, "
            "`_commit_version` bigint, `_commit_timestamp` timestamp"
        )

    def streamReader(self, schema):
        return _DeltaChangesStreamReader(
            schema.json(), dict(self.options)
        )


def register_stream_sources(spark) -> None:
    """Register the lakehouse streaming sources on this session."""
    spark.dataSource.register(IcebergAppendsDataSource)
    spark.dataSource.register(DeltaAppendsDataSource)
    spark.dataSource.register(IcebergChangesDataSource)
    spark.dataSource.register(DeltaChangesDataSource)


def catalog_stream_options(spark, table: str) -> dict:
    """Resolve ``'alias[.namespace].table'`` against an ATTACHed
    iceberg_rest catalog into explicit ``endpoint``/``table``
    [+ ``token``] stream options (r14, VERDICT r13 #4).

    Resolution happens AT STREAM CONSTRUCTION in the user's process —
    it cannot happen inside the DataSource: PySpark 4 plans Python data
    sources in a separate worker process that shares none of the
    driver's module state, so the attach registry is unreachable there.
    A two-part reference resolves against the catalog's sole namespace
    (the same contract as catalog-routed DML). A credential-attached
    alias passes the CREDENTIAL through (r15, VERDICT r14 #4): the
    stream reader re-exchanges it through the expiry-aware OAuth cache
    at every planning call, so a stream outliving any one bearer's TTL
    keeps running without reconstruction. A static token is baked
    as-is (there is nothing to re-exchange)."""
    from glaredb_spark.sources.iceberg_rest import (
        IcebergRestError,
        _attached,
        namespace_names,
        resolve_auth,
    )

    alias, dot, rest_ = table.partition(".")
    if not dot:
        raise ValueError(
            "catalog stream table must be 'alias[.namespace].table'; "
            f"got {table!r}"
        )
    if alias not in _attached(spark):
        raise IcebergRestError(
            f"no attached iceberg rest catalog named '{alias}'; "
            f"ATTACH ICEBERG_REST DATABASE AS {alias} (...) first"
        )
    endpoint, token, credential = _attached(spark)[alias]
    live = resolve_auth(endpoint, token, credential)
    ns, _, tbl = rest_.rpartition(".")
    if not ns:
        names = namespace_names(endpoint, token=live)
        if len(names) != 1:
            raise ValueError(
                f"namespace required for stream over '{alias}.{tbl}': "
                f"catalog has {len(names)} namespaces; use "
                f"'{alias}.<namespace>.{tbl}'"
            )
        ns = names[0]
    out = {"endpoint": endpoint, "table": f"{ns}.{tbl}"}
    if credential:
        out["credential"] = credential
    elif token:
        out["token"] = token
    return out


def read_catalog_stream(spark, fmt: str, table: str, **options):
    """``readStream`` over an ATTACHed catalog table:
    ``read_catalog_stream(spark, 'iceberg_changes', 'lake.core.t')``
    ≡ ``spark.readStream.format('iceberg_changes')`` with the alias
    resolved to endpoint/token/table options at construction. Extra
    keyword options (starting_seq, skip_non_appends, ...) pass
    through. Delta streams are path-addressed (the REST catalog holds
    Iceberg tables), so only the iceberg_* formats accept aliases."""
    reader = spark.readStream.format(fmt)
    for k, v in {**options, **catalog_stream_options(spark, table)}.items():
        reader = reader.option(k, str(v))
    return reader.load()

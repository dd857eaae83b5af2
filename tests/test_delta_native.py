"""Native Delta-log reader tests. The tables are hand-authored per the
public Delta transaction-log spec (delta.io PROTOCOL.md) — data files via
pyarrow, commits as newline-delimited action JSON — because the container
has no delta-spark jar to write them (that absence is exactly why the
native reader exists)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from glaredb_spark.sources.delta_native import load_delta_state, read_delta_native

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_data(path: str, ids, vs) -> None:
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()), "v": vs}), path)


def _commit(log_dir: str, version: int, actions: list[dict]) -> None:
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(partition_cols=()) -> dict:
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_JSON,
            "partitionColumns": list(partition_cols),
            "configuration": {},
        }
    }


def _add(path: str, pv=None) -> dict:
    return {
        "add": {
            "path": path,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


@pytest.fixture()
def delta_table(tmp_path):
    """Unpartitioned table: v0 adds two files, v1 removes one + adds one."""
    root = tmp_path / "tbl"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _write_data(str(root / "a.parquet"), [1, 2], ["x", "y"])
    _write_data(str(root / "b.parquet"), [3], ["z"])
    _write_data(str(root / "c.parquet"), [4], ["w"])
    _commit(
        str(log),
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            _add("a.parquet"),
            _add("b.parquet"),
        ],
    )
    _commit(
        str(log),
        1,
        [
            {"remove": {"path": "b.parquet", "dataChange": True}},
            _add("c.parquet"),
        ],
    )
    return str(root)


def test_log_fold_add_remove(delta_table):
    state = load_delta_state(delta_table)
    assert sorted(state.adds) == ["a.parquet", "c.parquet"]


def test_read_unpartitioned(spark, delta_table):
    rows = {
        (r["id"], r["v"]) for r in read_delta_native(spark, delta_table).collect()
    }
    assert rows == {(1, "x"), (2, "y"), (4, "w")}


def test_read_through_lakehouse_facade(spark, delta_table):
    """read_delta falls back to the native reader when the jar is absent."""
    from glaredb_spark.sources.lakehouse import delta_available, read_delta

    if delta_available(spark):
        pytest.skip("connector jar present; fallback path not exercised")
    assert read_delta(spark, delta_table).count() == 3


def test_read_partitioned(spark, tmp_path):
    """Partition columns come from partitionValues, typed per the schema."""
    root = tmp_path / "ptbl"
    log = root / "_delta_log"
    (root / "p=1").mkdir(parents=True)
    (root / "p=2").mkdir()
    log.mkdir()
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), str(root / "p=1/a.parquet"))
    pq.write_table(pa.table({"id": pa.array([2], pa.int64())}), str(root / "p=2/b.parquet"))
    meta = _meta(["p"])
    meta["metaData"]["schemaString"] = schema
    _commit(
        str(log),
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            meta,
            _add("p=1/a.parquet", {"p": "1"}),
            _add("p=2/b.parquet", {"p": "2"}),
        ],
    )
    df = read_delta_native(spark, str(root))
    assert df.dtypes == [("id", "bigint"), ("p", "int")]
    assert {(r["id"], r["p"]) for r in df.collect()} == {(1, 1), (2, 2)}


def test_checkpoint_replay(spark, tmp_path):
    """_last_checkpoint seeds the state; later JSON commits replay on top."""
    root = tmp_path / "ctbl"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _write_data(str(root / "a.parquet"), [1], ["x"])
    _write_data(str(root / "b.parquet"), [2], ["y"])
    # checkpoint at version 0: protocol + metaData + add(a)
    proto_t = pa.struct([("minReaderVersion", pa.int32())])
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
        ]
    )
    add_t = pa.struct(
        [("path", pa.string()), ("partitionValues", pa.map_(pa.string(), pa.string()))]
    )
    cp = pa.table(
        {
            "protocol": pa.array([{"minReaderVersion": 1}, None, None], proto_t),
            "metaData": pa.array(
                [
                    None,
                    {"id": "0", "schemaString": SCHEMA_JSON, "partitionColumns": []},
                    None,
                ],
                meta_t,
            ),
            "add": pa.array(
                [None, None, {"path": "a.parquet", "partitionValues": []}], add_t
            ),
        }
    )
    pq.write_table(cp, str(log / f"{0:020d}.checkpoint.parquet"))
    with open(log / "_last_checkpoint", "w") as fh:
        json.dump({"version": 0, "size": 3}, fh)
    # version 0 json deliberately absent (vacuumed); version 1 adds b
    _commit(str(log), 1, [_add("b.parquet")])
    rows = {
        (r["id"], r["v"])
        for r in read_delta_native(spark, str(root)).collect()
    }
    assert rows == {(1, "x"), (2, "y")}


_UUID = "0f7d3a2b-1c4e-4b5a-9d6f-2e8a7c9b0d1e"


def _v2_sidecar(log, name: str, adds=(), removes=()) -> None:
    """Author a sidecar parquet under _delta_log/_sidecars/ (PROTOCOL.md:
    sidecars hold only add/remove actions)."""
    side = log / "_sidecars"
    side.mkdir(exist_ok=True)
    add_t = pa.struct(
        [("path", pa.string()),
         ("partitionValues", pa.map_(pa.string(), pa.string())),
         ("size", pa.int64()), ("modificationTime", pa.int64()),
         ("dataChange", pa.bool_())]
    )
    rm_t = pa.struct(
        [("path", pa.string()), ("deletionTimestamp", pa.int64())]
    )
    n = len(adds) + len(removes)
    cols = {
        "add": pa.array(
            [{"path": p, "partitionValues": [], "size": 1,
              "modificationTime": 0, "dataChange": True} for p in adds]
            + [None] * len(removes),
            add_t,
        ),
        "remove": pa.array(
            [None] * len(adds)
            + [{"path": p, "deletionTimestamp": 1} for p in removes],
            rm_t,
        ),
    }
    assert n
    pq.write_table(pa.table(cols), str(side / name))


def _v2_protocol_meta_arrays():
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
         ("readerFeatures", pa.list_(pa.string())),
         ("writerFeatures", pa.list_(pa.string()))]
    )
    meta_t = pa.struct(
        [("id", pa.string()), ("schemaString", pa.string()),
         ("partitionColumns", pa.list_(pa.string()))]
    )
    return proto_t, meta_t


def test_v2_checkpoint_parquet_with_sidecars(spark, tmp_path):
    """v2Checkpoint read path: UUID-named top-level checkpoint carrying
    checkpointMetadata + protocol/metaData + sidecar pointers; add/remove
    actions live in _delta_log/_sidecars/*.parquet; later JSON commits
    replay on top (reference model: glaredb_ext_delta reads the same
    delta.io PROTOCOL.md surface)."""
    root = tmp_path / "v2tbl"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    for name, i, v in (("a.parquet", 1, "x"), ("b.parquet", 2, "y"),
                       ("d.parquet", 4, "w")):
        _write_data(str(root / name), [i], [v])
    # two sidecars: one adds a+b, one adds-then-removes c (net: a, b)
    _v2_sidecar(log, "s1.parquet", adds=("a.parquet", "b.parquet"))
    _v2_sidecar(log, "s2.parquet", removes=("c.parquet",))
    proto_t, meta_t = _v2_protocol_meta_arrays()
    cpmeta_t = pa.struct([("version", pa.int64())])
    side_t = pa.struct(
        [("path", pa.string()), ("sizeInBytes", pa.int64()),
         ("modificationTime", pa.int64())]
    )
    rows = 5  # checkpointMetadata, protocol, metaData, sidecar x2
    top = pa.table(
        {
            "checkpointMetadata": pa.array(
                [{"version": 2}] + [None] * 4, cpmeta_t
            ),
            "protocol": pa.array(
                [None,
                 {"minReaderVersion": 3, "minWriterVersion": 7,
                  "readerFeatures": ["v2Checkpoint"],
                  "writerFeatures": ["v2Checkpoint"]}]
                + [None] * 3,
                proto_t,
            ),
            "metaData": pa.array(
                [None, None,
                 {"id": "0", "schemaString": SCHEMA_JSON,
                  "partitionColumns": []}]
                + [None] * 2,
                meta_t,
            ),
            "sidecar": pa.array(
                [None] * 3
                + [{"path": "s1.parquet", "sizeInBytes": 1,
                    "modificationTime": 0},
                   {"path": "s2.parquet", "sizeInBytes": 1,
                    "modificationTime": 0}],
                side_t,
            ),
        }
    )
    assert top.num_rows == rows
    pq.write_table(top, str(log / f"{2:020d}.checkpoint.{_UUID}.parquet"))
    with open(log / "_last_checkpoint", "w") as fh:
        json.dump({"version": 2, "size": rows}, fh)
    # pre-checkpoint commits vacuumed; version 3 adds d on top
    _commit(str(log), 3, [_add("d.parquet")])
    rows_out = {
        (r["id"], r["v"])
        for r in read_delta_native(spark, str(root)).collect()
    }
    assert rows_out == {(1, "x"), (2, "y"), (4, "w")}


def test_v2_checkpoint_json(spark, tmp_path):
    """The JSON flavor of a v2 checkpoint (PROTOCOL.md allows both)."""
    root = tmp_path / "v2json"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _write_data(str(root / "a.parquet"), [7], ["z"])
    _v2_sidecar(log, "s.parquet", adds=("a.parquet",))
    with open(log / f"{1:020d}.checkpoint.{_UUID}.json", "w") as fh:
        for action in (
            {"checkpointMetadata": {"version": 1}},
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"],
                          "writerFeatures": ["v2Checkpoint"]}},
            json.loads(json.dumps(_meta())),
            {"sidecar": {"path": "s.parquet", "sizeInBytes": 1,
                         "modificationTime": 0}},
        ):
            fh.write(json.dumps(action) + "\n")
    rows = {
        (r["id"], r["v"])
        for r in read_delta_native(spark, str(root)).collect()
    }
    assert rows == {(7, "z")}


def test_unsupported_features_rejected(tmp_path):
    """Reader features outside the implemented set still fail loudly
    (deletionVectors and columnMapping became SUPPORTED in r5 —
    tests/test_deletion_vectors.py)."""
    root = tmp_path / "tw"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _commit(
        str(log),
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["variantType"],
                }
            },
            _meta(),
        ],
    )
    with pytest.raises(RuntimeError, match="variantType"):
        load_delta_state(str(root))


def test_not_a_delta_table(tmp_path):
    with pytest.raises(RuntimeError, match="_delta_log"):
        load_delta_state(str(tmp_path))

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
                    "readerFeatures": ["typeWidening"],
                }
            },
            _meta(),
        ],
    )
    with pytest.raises(RuntimeError, match="typeWidening"):
        load_delta_state(str(root))


def test_not_a_delta_table(tmp_path):
    with pytest.raises(RuntimeError, match="_delta_log"):
        load_delta_state(str(tmp_path))

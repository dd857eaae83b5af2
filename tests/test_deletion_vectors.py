"""Delta deletion-vector READS: the roaring codec (sources/roaring.py —
format pinned against hand-computed byte vectors from the public
RoaringFormatSpec) and the scan-time anti-join in
sources/delta_native.py. DV tables are authored from scratch here, the
same log layer delta-spark writes."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from glaredb_spark.sources import roaring as R


# -- byte-level format pins --------------------------------------------------


def test_rbm32_array_container_exact_bytes():
    """{1, 2, 3} -> no-run cookie, one array container, hand-computed."""
    got = R._encode_rbm32(np.array([1, 2, 3], np.uint32))
    want = (
        struct.pack("<ii", 12346, 1)      # cookie, container count
        + struct.pack("<HH", 0, 2)        # key 0, cardinality-1
        + struct.pack("<I", 16)           # offset of container data
        + struct.pack("<HHH", 1, 2, 3)    # array container values
    )
    assert got == want
    vals, pos = R._decode_rbm32(want, 0)
    assert list(vals) == [1, 2, 3] and pos == len(want)


def test_rbm32_run_container_decode():
    """Hand-encoded run-format bitmap ([5,9] run): cookie 12347 with
    container count in the high bits, run bitset, no offsets below the
    4-container threshold."""
    buf = (
        struct.pack("<i", 12347 | (0 << 16))  # 1 container
        + b"\x01"                              # run bitset: container 0 is runs
        + struct.pack("<HH", 0, 4)             # key 0, card-1 (5 values)
        + struct.pack("<H", 1)                 # 1 run
        + struct.pack("<HH", 5, 4)             # start 5, length-1 = 4
    )
    vals, pos = R._decode_rbm32(buf, 0)
    assert list(vals) == [5, 6, 7, 8, 9] and pos == len(buf)


def test_rbm32_bitmap_container_roundtrip():
    dense = np.arange(0, 9000, dtype=np.uint32)  # card > 4096 -> bitmap
    enc = R._encode_rbm32(dense)
    vals, _ = R._decode_rbm32(enc, 0)
    assert np.array_equal(vals, dense)


def test_portable64_multi_bucket_roundtrip():
    positions = [0, 1, 70000, (1 << 32) + 5, (1 << 33) + 123456]
    blob = R.encode_portable64(positions)
    assert list(R.decode_portable64(blob)) == sorted(positions)


def test_z85_known_vector():
    # ZeroMQ's spec test vector: "HelloWorld" encodes 0x86 0x4F 0xD2 ...
    assert R.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    assert R.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F])) == "Hello"


def test_dv_file_roundtrip_and_checksum(tmp_path):
    p = str(tmp_path / "dv.bin")
    offset, size = R.write_dv_file(p, [3, 7, 1 << 33])
    assert list(R.read_dv_file(p, offset, size)) == [3, 7, 1 << 33]
    # corrupt one payload byte -> checksum failure
    data = bytearray(open(p, "rb").read())
    data[offset + 10] ^= 0xFF
    open(p, "wb").write(bytes(data))
    with pytest.raises(R.RoaringError, match="checksum"):
        R.read_dv_file(p, offset, size)


# -- scan integration --------------------------------------------------------


def _author_dv_table(spark, tmp_path, dv_for, inline=False, part_col=None):
    """Two-file table (ids 0-9, 10-19); dv_for: {relpath: [positions]}."""
    from glaredb_spark.sources.roaring import encode_dv_blob, z85_encode

    root = str(tmp_path / "dvt")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    fields = [{"name": "id", "type": "long", "nullable": True, "metadata": {}},
              {"name": "val", "type": "string", "nullable": True,
               "metadata": {}}]
    part_cols = []
    if part_col:
        fields.append({"name": part_col, "type": "string", "nullable": True,
                       "metadata": {}})
        part_cols = [part_col]
    schema = {"type": "struct", "fields": fields}
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t1", "format": {"provider": "parquet",
                                             "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": part_cols,
                      "configuration": {}}},
    ]
    for i, (rel, lo, hi) in enumerate(
        [("a.parquet", 0, 10), ("b.parquet", 10, 20)]
    ):
        sub = os.path.join(root, f"p={i}") if part_col else root
        os.makedirs(sub, exist_ok=True)
        full = os.path.join(sub, rel)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"id": pa.array(range(lo, hi), pa.int64()),
                      "val": pa.array([f"v{j}" for j in range(lo, hi)])}),
            full,
        )
        relpath = os.path.relpath(full, root)
        add = {"path": relpath,
               "partitionValues": {part_col: str(i)} if part_col else {},
               "size": os.path.getsize(full),
               "modificationTime": 0, "dataChange": True}
        if relpath in dv_for:
            if inline:
                blob = encode_dv_blob(dv_for[relpath])
                pad = (-len(blob)) % 4
                add["deletionVector"] = {
                    "storageType": "i",
                    "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
                    "sizeInBytes": len(blob),
                    "cardinality": len(dv_for[relpath]),
                }
            else:
                dvp = os.path.join(root, f"dv_{i}.bin")
                offset, size = R.write_dv_file(dvp, dv_for[relpath])
                add["deletionVector"] = {
                    "storageType": "p", "pathOrInlineDv": dvp,
                    "offset": offset, "sizeInBytes": size,
                    "cardinality": len(dv_for[relpath]),
                }
        actions.append({"add": add})
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return root


def test_dv_read_path_storage(spark, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    root = _author_dv_table(
        spark, tmp_path, {"a.parquet": [0, 3], "b.parquet": [9]}
    )
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(20) if i not in (0, 3, 19)]


def test_dv_read_inline_storage(spark, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    root = _author_dv_table(
        spark, tmp_path, {"a.parquet": [1, 2, 3, 4]}, inline=True
    )
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == [0] + list(range(5, 20))


def test_dv_read_partitioned(spark, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    root = _author_dv_table(
        spark, tmp_path, {os.path.join("p=1", "b.parquet"): [0, 1]},
        part_col="p",
    )
    df = read_delta_native(spark, root)
    got = sorted((r["id"], r["p"]) for r in df.collect())
    ids = [g[0] for g in got]
    assert ids == [i for i in range(20) if i not in (10, 11)]
    assert all(p == ("0" if i < 10 else "1") for i, p in got)


def test_dml_rejected_on_dv_table(spark, tmp_path):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        optimize_delta_native,
        vacuum_delta_native,
    )

    root = _author_dv_table(spark, tmp_path, {"a.parquet": [0]})
    for fn, args, kw in [
        (delete_delta_native, (spark, root, "id = 1"),
         {"strategy": "cow"}),
        (optimize_delta_native, (spark, root), {}),
        (vacuum_delta_native, (spark, root), {}),
    ]:
        with pytest.raises(RuntimeError, match="deletion vectors"):
            fn(*args, **kw)


def test_checkpoint_carries_deletion_vectors(spark, tmp_path):
    """Checkpointing a DV table keeps the vectors (r8; previously
    refused): the compacted log must not resurrect deleted rows even
    after the pre-checkpoint commits are cleaned up."""
    import os as _os

    from glaredb_spark.sources.delta_native import (
        checkpoint_delta_native,
        load_delta_state,
        read_delta_native,
    )

    root = _author_dv_table(spark, tmp_path, {"a.parquet": [0, 3]})
    before = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    v = checkpoint_delta_native(spark, root)
    # simulate log cleanup: remove every commit JSON at/below v
    log = _os.path.join(root, "_delta_log")
    for n in _os.listdir(log):
        if n.endswith(".json") and not n.startswith("_"):
            _os.unlink(_os.path.join(log, n))
    state = load_delta_state(root)
    dvs = [a for a in state.add_meta.values() if a.get("deletionVector")]
    assert dvs and dvs[0]["deletionVector"]["cardinality"] == 2
    after = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert after == before and 0 not in after and 3 not in after


# -- column mapping ----------------------------------------------------------


def _author_mapped_table(tmp_path, part=False, dv_positions=None):
    """Column-mapped table: logical (id, val[, p]) stored under physical
    names col-1/col-2/col-3 (name mode); partitionValues keyed physical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glaredb_spark.sources.roaring import encode_dv_blob, z85_encode

    root = str(tmp_path / "cmt")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-1"}},
        {"name": "val", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-2"}},
    ]
    part_cols = []
    if part:
        fields.append(
            {"name": "p", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-3"}})
        part_cols = ["p"]
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": "cm1",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(
                          {"type": "struct", "fields": fields}),
                      "partitionColumns": part_cols,
                      "configuration": {
                          "delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "3"}}},
    ]
    for i, (lo, hi) in enumerate([(0, 10), (10, 20)]):
        sub = os.path.join(root, f"col-3={i}") if part else root
        os.makedirs(sub, exist_ok=True)
        full = os.path.join(sub, f"f{i}.parquet")
        pq.write_table(
            pa.table({"col-1": pa.array(range(lo, hi), pa.int64()),
                      "col-2": pa.array([f"v{j}" for j in range(lo, hi)])}),
            full,
        )
        add = {"path": os.path.relpath(full, root),
               "partitionValues": {"col-3": str(i)} if part else {},
               "size": os.path.getsize(full),
               "modificationTime": 0, "dataChange": True}
        if dv_positions and i == 0:
            blob = encode_dv_blob(dv_positions)
            pad = (-len(blob)) % 4
            add["deletionVector"] = {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
                "sizeInBytes": len(blob),
                "cardinality": len(dv_positions),
            }
        actions.append({"add": add})
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return root


def test_column_mapping_read_logical_names(spark, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    root = _author_mapped_table(tmp_path)
    df = read_delta_native(spark, root)
    assert df.columns == ["id", "val"]
    got = sorted((r["id"], r["val"]) for r in df.collect())
    assert got == [(i, f"v{i}") for i in range(20)]


def test_column_mapping_partitioned(spark, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    root = _author_mapped_table(tmp_path, part=True)
    df = read_delta_native(spark, root)
    assert df.columns == ["id", "val", "p"]
    got = sorted((r["id"], r["p"]) for r in df.collect())
    assert [g[1] for g in got] == ["0"] * 10 + ["1"] * 10


def test_column_mapping_with_deletion_vector(spark, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    root = _author_mapped_table(tmp_path, dv_positions=[2, 4])
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(20) if i not in (2, 4)]


def _physical_parquet_columns(root):
    """Column names actually stored in the table's newest data files."""
    import pyarrow.parquet as pq

    from glaredb_spark.sources.delta_native import load_delta_state

    import urllib.parse as _up

    state = load_delta_state(root)
    names = set()
    for rel in state.adds:
        names.update(
            pq.read_schema(os.path.join(root, _up.unquote(rel))).names
        )
    return names


def test_column_mapping_cow_delete(spark, tmp_path):
    """COW DELETE on a column-mapped table: predicate binds logical
    names, rewritten files carry PHYSICAL names (VERDICT r5 #7 gap)."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native, read_delta_native)

    root = _author_mapped_table(tmp_path)
    deleted, rewritten = delete_delta_native(
        spark, root, "id >= 15", strategy="cow")
    assert (deleted, rewritten) == (5, 1)
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == list(range(15))
    assert _physical_parquet_columns(root) == {"col-1", "col-2"}


def test_column_mapping_cow_update_partitioned(spark, tmp_path):
    """UPDATE on a mapped PARTITIONED table: rewritten files land under
    physical k=v dirs and their add actions key partitionValues by
    physical name."""
    from glaredb_spark.sources.delta_native import (
        load_delta_state, read_delta_native, update_delta_native)

    root = _author_mapped_table(tmp_path, part=True)
    updated, rewritten = update_delta_native(
        spark, root, {"val": "'patched'"}, "id = 3", strategy="cow")
    assert (updated, rewritten) == (1, 1)
    df = read_delta_native(spark, root)
    assert {r["val"] for r in df.filter("id = 3").collect()} == {"patched"}
    assert df.filter("val = 'patched'").count() == 1
    state = load_delta_state(root)
    for pv in state.adds.values():
        assert set(pv) == {"col-3"}  # physical partition key everywhere


def test_column_mapping_dv_delete_then_purge(spark, tmp_path):
    """The columnMapping + deletionVectors + DML composition: DV DELETE
    marks rows in mapped files; PURGE materializes live rows back into
    physical-named plain files."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native, purge_delta_native, read_delta_native)

    root = _author_mapped_table(tmp_path, dv_positions=[2, 4])
    deleted, touched = delete_delta_native(
        spark, root, "id IN (7, 17)", strategy="dv")
    assert (deleted, touched) == (2, 2)
    got = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(20) if i not in (2, 4, 7, 17)]
    files, rows = purge_delta_native(spark, root)
    assert files == 2 and rows == 16
    got2 = sorted(r["id"] for r in read_delta_native(spark, root).collect())
    assert got2 == got
    assert _physical_parquet_columns(root) == {"col-1", "col-2"}


def test_column_mapping_append_and_merge(spark, tmp_path):
    """Plain appends and MERGE into a mapped table write physical names
    (a logical-named append would read back all-NULL)."""
    from glaredb_spark.sources.delta_native import (
        merge_delta_native, read_delta_native, write_delta_native)

    root = _author_mapped_table(tmp_path)
    extra = spark.createDataFrame([(100, "new")], "id long, val string")
    write_delta_native(extra, root, mode="append")
    df = read_delta_native(spark, root)
    assert df.filter("id = 100").collect()[0]["val"] == "new"
    assert df.filter("val IS NULL").count() == 0
    src = spark.createDataFrame(
        [(5, "merged"), (200, "inserted")], "id long, val string")
    updated, inserted, rewritten = merge_delta_native(
        spark, root, src, on=["id"])
    assert (updated, inserted) == (1, 1) and rewritten >= 1
    df2 = read_delta_native(spark, root)
    assert df2.filter("id = 5").collect()[0]["val"] == "merged"
    assert df2.filter("id = 200").count() == 1
    assert df2.count() == 22
    assert _physical_parquet_columns(root) == {"col-1", "col-2"}


def test_column_mapping_optimize(spark, tmp_path):
    """OPTIMIZE compacts mapped files physically-in physically-out."""
    from glaredb_spark.sources.delta_native import (
        optimize_delta_native, read_delta_native)

    root = _author_mapped_table(tmp_path)
    before, after = optimize_delta_native(spark, root)
    assert before == 2 and after == 1
    assert read_delta_native(spark, root).count() == 20
    assert _physical_parquet_columns(root) == {"col-1", "col-2"}


def test_unknown_reader_feature_still_refused(spark, tmp_path):
    from glaredb_spark.sources.delta_native import load_delta_state

    root = str(tmp_path / "vx")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["variantType"]}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": []}),
            "partitionColumns": [], "configuration": {}}}) + "\n")
    with pytest.raises(RuntimeError, match="variantType"):
        load_delta_state(root)


# -- DV-writing DELETE -------------------------------------------------------


def test_dv_delete_marks_rows_without_rewrite(spark, sf_dir, tmp_path):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        load_delta_state,
        read_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .filter("doc_id < 60")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root)
    before_files = {
        p for p in load_delta_state(root).adds
    }
    deleted, touched = delete_delta_native(
        spark, root, "doc_id % 5 = 2", strategy="dv"
    )
    assert deleted == 12 and touched >= 1
    got = sorted(r["id"] if "id" in r else r["doc_id"]
                 for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(60) if i % 5 != 2]
    # the DATA files were not rewritten — same paths, now DV-carrying
    state = load_delta_state(root)
    assert set(state.adds) == before_files
    assert all(
        state.add_meta[p].get("deletionVector") for p in state.adds
        if state.add_meta[p].get("deletionVector")
    )
    assert any(a.get("deletionVector") for a in state.add_meta.values())


def test_dv_delete_unions_with_existing_vectors(spark, sf_dir, tmp_path):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        read_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .filter("doc_id < 40")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root)
    d1, _ = delete_delta_native(spark, root, "doc_id < 5", strategy="dv")
    d2, _ = delete_delta_native(
        spark, root, "doc_id >= 35", strategy="dv"
    )
    assert (d1, d2) == (5, 5)
    # re-deleting already-deleted rows is a no-op
    assert delete_delta_native(
        spark, root, "doc_id < 5", strategy="dv"
    ) == (0, 0)
    got = sorted(r["doc_id"]
                 for r in read_delta_native(spark, root).collect())
    assert got == list(range(5, 35))


def test_dv_delete_partitioned(spark, sf_dir, tmp_path):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        read_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .filter("doc_id < 80")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root, partition_by=["lang"])
    deleted, _ = delete_delta_native(
        spark, root, "doc_id % 4 = 1", strategy="dv"
    )
    assert deleted == 20
    got = sorted(r["doc_id"]
                 for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(80) if i % 4 != 1]


def test_auto_strategy_follows_table_state(spark, sf_dir, tmp_path):
    """Default strategy='auto': COW on plain tables, DV once the table
    carries vectors — the SQL surface keeps working after a table goes
    merge-on-read; explicit COW on a DV table still raises."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        load_delta_state,
        read_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .filter("doc_id < 20")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root)
    # plain table: auto = COW (no DVs appear)
    delete_delta_native(spark, root, "doc_id = 19")
    assert not any(
        a.get("deletionVector")
        for a in load_delta_state(root).add_meta.values()
    )
    delete_delta_native(spark, root, "doc_id = 0", strategy="dv")
    # DV table: auto = DV, and the result stays correct
    d, _ = delete_delta_native(spark, root, "doc_id = 1")
    assert d == 1
    got = sorted(r["doc_id"]
                 for r in read_delta_native(spark, root).collect())
    assert got == list(range(2, 19))
    with pytest.raises(RuntimeError, match="deletion vectors"):
        delete_delta_native(spark, root, "doc_id = 2", strategy="cow")


def test_dv_update_marks_and_appends(spark, sf_dir, tmp_path):
    from glaredb_spark.sources.delta_native import (
        load_delta_state,
        read_delta_native,
        update_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .filter("doc_id < 50")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root)
    before_files = set(load_delta_state(root).adds)
    updated, touched = update_delta_native(
        spark, root, {"n_chars": "n_chars + 1000"}, "doc_id < 8",
        strategy="dv",
    )
    assert updated == 8 and touched >= 1
    got = {r["doc_id"]: r["n_chars"]
           for r in read_delta_native(spark, root).collect()}
    src = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    assert len(got) == 50
    assert got == {
        k: (v + 1000 if k < 8 else v) for k, v in src.items()
    }
    # original data files still referenced (DV'd), plus new append files
    after = load_delta_state(root)
    assert before_files <= set(after.adds)
    assert len(after.adds) > len(before_files)


def test_purge_materializes_vectors(spark, sf_dir, tmp_path):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        load_delta_state,
        purge_delta_native,
        read_delta_native,
        vacuum_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .filter("doc_id < 60")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root)
    delete_delta_native(spark, root, "doc_id % 3 = 0", strategy="dv")
    files, rows = purge_delta_native(spark, root)
    assert files >= 1 and rows == 40
    state = load_delta_state(root)
    assert not any(
        a.get("deletionVector") for a in state.add_meta.values()
    )
    got = sorted(r["doc_id"]
                 for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(60) if i % 3 != 0]
    # COW DML and VACUUM are usable again after the purge
    d, _ = delete_delta_native(spark, root, "doc_id = 1")
    assert d == 1
    vacuum_delta_native(spark, root, retention_hours=0)
    assert sorted(
        r["doc_id"] for r in read_delta_native(spark, root).collect()
    ) == [i for i in range(60) if i % 3 != 0 and i != 1]
    # idempotent when nothing carries a vector
    assert purge_delta_native(spark, root) == (0, 0)


def test_dv_update_partitioned(spark, sf_dir, tmp_path):
    from glaredb_spark.sources.delta_native import (
        read_delta_native,
        update_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .filter("doc_id < 60")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root, partition_by=["lang"])
    updated, _ = update_delta_native(
        spark, root, {"n_chars": "n_chars * 10"}, "doc_id % 6 = 1",
        strategy="dv",
    )
    assert updated == 10
    got = {r["doc_id"]: (r["lang"], r["n_chars"])
           for r in read_delta_native(spark, root).collect()}
    src = {r["doc_id"]: (r["lang"], r["n_chars"])
           for r in docs.collect()}
    assert len(got) == 60
    for k, (lang, v) in src.items():
        want = v * 10 if k % 6 == 1 else v
        assert got[k] == (lang, want), (k, got[k], (lang, want))


def test_dv_partition_values_with_uri_chars(spark, tmp_path):
    """Partition values containing URI-escapable characters (space, %,
    #) plus a literal '+': Spark reports _metadata.file_path
    URI-encoded, so the DV join key must be decoded before matching
    driver-side abspaths — otherwise deleted rows silently resurrect
    (ADVICE r5). '+' stays literal in the URI, so a plain url_decode
    would corrupt it the other way."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        load_delta_state,
        read_delta_native,
        write_delta_native,
    )

    df = spark.createDataFrame(
        [(i, "a b%c#d+e" if i < 10 else "plain") for i in range(20)],
        "id long, p string",
    )
    root = str(tmp_path / "dt")
    write_delta_native(df, root, partition_by=["p"])
    deleted, _ = delete_delta_native(spark, root, "id % 2 = 0",
                                     strategy="dv")
    assert deleted == 10
    got = sorted((r["id"], r["p"])
                 for r in read_delta_native(spark, root).collect())
    assert [g[0] for g in got] == [i for i in range(20) if i % 2 == 1]
    assert all(p == ("a b%c#d+e" if i < 10 else "plain") for i, p in got)
    # second delete unions into the same vectors (hits the existing-DV
    # read inside the DML scan too)
    deleted2, _ = delete_delta_native(spark, root, "id in (1, 11)",
                                      strategy="dv")
    assert deleted2 == 2
    assert sorted(r["id"] for r in read_delta_native(spark, root).collect()
                  ) == [i for i in range(20) if i % 2 == 1 and i not in (1, 11)]
    assert any(a.get("deletionVector")
               for a in load_delta_state(root).add_meta.values())


def test_checkpoint_preserves_feature_protocol(spark, sf_dir, tmp_path):
    """DV DML upgrades the table to reader v3 / writer v7 with feature
    lists; after REORG PURGE (no vectors left) a checkpoint must carry
    that protocol through — v3 REQUIRES readerFeatures per PROTOCOL.md,
    and dropping minWriterVersion disables feature enforcement for
    external writers (ADVICE r5)."""
    import pyarrow.parquet as pq

    from glaredb_spark.sources.delta_native import (
        checkpoint_delta_native,
        delete_delta_native,
        load_delta_state,
        purge_delta_native,
        read_delta_native,
        write_delta_native,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .filter("doc_id < 40")
    )
    root = str(tmp_path / "dt")
    write_delta_native(docs, root)
    delete_delta_native(spark, root, "doc_id % 4 = 0", strategy="dv")
    purge_delta_native(spark, root)
    version = checkpoint_delta_native(spark, root)
    cp = os.path.join(root, "_delta_log",
                      f"{version:020d}.checkpoint.parquet")
    protos = [r["protocol"] for r in pq.read_table(cp).to_pylist()
              if r.get("protocol")]
    assert len(protos) == 1
    p = protos[0]
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "deletionVectors" in (p["readerFeatures"] or [])
    assert "deletionVectors" in (p["writerFeatures"] or [])
    # a state fold that starts FROM this checkpoint sees the features
    for f in os.listdir(os.path.join(root, "_delta_log")):
        if f.endswith(".json"):
            os.unlink(os.path.join(root, "_delta_log", f))
    state = load_delta_state(root)
    assert state.min_reader_version == 3
    assert state.min_writer_version == 7
    assert "deletionVectors" in state.reader_features
    assert "deletionVectors" in state.writer_features
    got = sorted(r["doc_id"]
                 for r in read_delta_native(spark, root).collect())
    assert got == [i for i in range(40) if i % 4 != 0]

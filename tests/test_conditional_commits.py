"""r11 (VERDICT r10 next #4): object-store optimistic concurrency for
lakehouse COMMIT publishes — S3 conditional writes (If-None-Match: *)
against a live moto server and GCS ifGenerationMatch=0 against the live
JSON-API emulator, routed through the same publish_atomic() the local
O_EXCL path uses. Two concurrent committers at one version: exactly one
winner, the loser gets FileExistsError and retries cleanly at the next
version — on BOTH formats' commit artifacts."""

import json
import threading

import pytest

from glaredb_spark.sources import objectstore
from glaredb_spark.sources.objectstore import (
    publish_atomic,
    put_if_absent,
    put_object_url,
)


@pytest.fixture()
def moto_s3(monkeypatch):
    pytest.importorskip("boto3")
    pytest.importorskip("moto")
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    monkeypatch.setenv("AWS_ENDPOINT_URL", endpoint)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    import boto3

    s3 = boto3.client("s3", endpoint_url=endpoint)
    s3.create_bucket(Bucket="lake")
    try:
        yield s3
    finally:
        objectstore._S3_CACHE.clear()
        server.stop()


@pytest.fixture()
def gcs_em(monkeypatch):
    from glaredb_spark.sources.gcs_emulator import GcsEmulator

    em = GcsEmulator()
    em.create_bucket("lake")
    hostport = em.start()
    monkeypatch.setenv("STORAGE_EMULATOR_HOST", hostport)
    try:
        yield em
    finally:
        em.stop()


def _race(url_fmt: str, n: int = 8) -> list:
    """n threads race put_if_absent at ONE url; returns winner payloads."""
    barrier = threading.Barrier(n)
    results: list = [None] * n

    def attempt(i: int) -> None:
        barrier.wait()
        try:
            put_if_absent(url_fmt, f"writer-{i}".encode())
            results[i] = "won"
        except FileExistsError:
            results[i] = "lost"

    threads = [
        threading.Thread(target=attempt, args=(i,)) for i in range(n)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def test_s3_put_if_absent_one_winner(moto_s3):
    results = _race("s3://lake/tbl/_delta_log/00000000000000000000.json")
    assert results.count("won") == 1
    assert results.count("lost") == 7
    body = moto_s3.get_object(
        Bucket="lake", Key="tbl/_delta_log/00000000000000000000.json"
    )["Body"].read()
    assert body == f"writer-{results.index('won')}".encode()


def test_gcs_put_if_absent_one_winner(gcs_em):
    results = _race("gs://lake/tbl/metadata/v1.metadata.json")
    assert results.count("won") == 1
    data = gcs_em._objects["lake"]["tbl/metadata/v1.metadata.json"]
    assert data == f"writer-{results.index('won')}".encode()
    # a later unconditional put (version-hint) still lands
    put_object_url("gs://lake/tbl/metadata/version-hint.text", b"1")
    assert gcs_em._objects["lake"]["tbl/metadata/version-hint.text"] == b"1"


def test_delta_commit_race_and_retry_s3(moto_s3):
    """The Delta commit publish itself (_commit_actions) on an s3://
    log dir: same-version collision raises, the loser re-reads and
    retries at version+1 — the exact local-O_EXCL contract."""
    from glaredb_spark.sources.delta_native import _commit_actions

    log = "s3://lake/dtab/_delta_log"
    a0 = [{"commitInfo": {"operation": "WRITE", "timestamp": 1}}]
    _commit_actions(log, 0, a0)
    with pytest.raises(FileExistsError):
        _commit_actions(log, 0, a0)  # lost the race
    _commit_actions(log, 1, a0)  # clean retry at the next version
    keys = sorted(
        o["Key"] for o in moto_s3.list_objects_v2(
            Bucket="lake", Prefix="dtab/_delta_log/"
        )["Contents"]
    )
    assert keys == [
        "dtab/_delta_log/00000000000000000000.json",
        "dtab/_delta_log/00000000000000000001.json",
    ]
    body = moto_s3.get_object(Bucket="lake", Key=keys[0])["Body"].read()
    assert json.loads(body) == a0[0]


def test_iceberg_metadata_race_and_retry_gcs(gcs_em):
    """The Iceberg metadata publish shape on gs://: vN collision
    raises, retry at vN+1 wins, version-hint is last-writer-wins."""
    meta1 = json.dumps({"format-version": 2, "v": 1}).encode()
    meta2 = json.dumps({"format-version": 2, "v": 2}).encode()
    publish_atomic("gs://lake/itab/metadata/v1.metadata.json", meta1)
    with pytest.raises(FileExistsError):
        publish_atomic("gs://lake/itab/metadata/v1.metadata.json", meta2)
    publish_atomic("gs://lake/itab/metadata/v2.metadata.json", meta2)
    put_object_url("gs://lake/itab/metadata/version-hint.text", b"2")
    objs = gcs_em._objects["lake"]
    assert json.loads(objs["itab/metadata/v1.metadata.json"])["v"] == 1
    assert json.loads(objs["itab/metadata/v2.metadata.json"])["v"] == 2
    assert objs["itab/metadata/version-hint.text"] == b"2"


def test_local_publish_atomic_unchanged(tmp_path):
    """Local paths keep O_CREAT|O_EXCL semantics byte-for-byte."""
    p = str(tmp_path / "00000000000000000000.json")
    publish_atomic(p, b"one\n")
    with pytest.raises(FileExistsError):
        publish_atomic(p, b"two\n")
    assert open(p, "rb").read() == b"one\n"


def test_local_lakehouse_writers_still_commit(spark, tmp_path):
    """End-to-end: both writers' commit paths run through
    publish_atomic on local disk unchanged."""
    from glaredb_spark.sources.delta_native import (
        read_delta_native,
        write_delta_native,
    )
    from glaredb_spark.sources.iceberg_native import (
        read_iceberg_native,
        write_iceberg_native,
    )

    d = str(tmp_path / "d")
    i = str(tmp_path / "i")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_delta_native(df, d)
    write_iceberg_native(df, i, format_version=2)
    assert read_delta_native(spark, d).count() == 2
    assert read_iceberg_native(spark, i).count() == 2

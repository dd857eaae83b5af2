"""HTTP(S) read path — mirrors reference slt/http/read_parquet_http.slt and
read_csv_http.slt: the same fixtures served over a local http.server must
read identically to local-path reads."""

import http.server
import os
import shutil
import socketserver
import threading

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("http_root")
    shutil.copy(os.path.join(SF_SMALL, "nation.parquet"), root / "nation.parquet")
    (root / "people.csv").write_text('id,name,notes\n1,amy,"x;y"\n2,bo,"q""t"\n')
    (root / "hello.txt").write_text("hello over http\n")
    return root


@pytest.fixture(scope="module")
def http_url(http_root):
    hits = {"n": 0}

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(http_root), **kw)

        def log_message(self, *a):
            pass

        def do_GET(self):
            hits["n"] += 1
            super().do_GET()

    with socketserver.TCPServer(("127.0.0.1", 0), Handler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}", hits
        srv.shutdown()


@pytest.fixture(autouse=True)
def fresh_cache(tmp_path, monkeypatch):
    import glaredb_spark.sources.httpfs as httpfs

    monkeypatch.setattr(httpfs, "_CACHE_DIR", str(tmp_path / "cache"))


def test_read_parquet_http_matches_local(spark, http_url):
    from glaredb_spark.sources.files import read_parquet

    url, _ = http_url
    local = read_parquet(spark, os.path.join(SF_SMALL, "nation.parquet"))
    remote = read_parquet(spark, f"{url}/nation.parquet")
    assert remote.schema == local.schema
    assert sorted(map(tuple, remote.collect())) == sorted(map(tuple, local.collect()))


def test_read_csv_http(spark, http_url):
    from glaredb_spark.sources.files import read_csv

    url, _ = http_url
    rows = sorted(map(tuple, read_csv(spark, f"{url}/people.csv").collect()))
    assert rows == [(1, "amy", "x;y"), (2, "bo", 'q"t')]


def test_read_text_http(spark, http_url):
    from glaredb_spark.sources.files import read_text

    url, _ = http_url
    rows = read_text(spark, f"{url}/hello.txt").collect()
    assert len(rows) == 1 and rows[0].content == "hello over http\n"


def test_http_fetch_cached_once(spark, http_url):
    from glaredb_spark.sources.files import read_parquet

    url, hits = http_url
    before = hits["n"]
    read_parquet(spark, f"{url}/nation.parquet").count()
    mid = hits["n"]
    read_parquet(spark, f"{url}/nation.parquet").count()
    assert hits["n"] == mid  # second read served from the local cache
    assert mid > before


def test_parquet_metadata_over_http(spark, http_url):
    from glaredb_spark.sources.files import parquet_file_metadata

    url, _ = http_url
    md = parquet_file_metadata(spark, f"{url}/nation.parquet").collect()
    assert len(md) == 1 and md[0].num_rows == 25


def test_glob_http_exact_and_errors(spark, http_url):
    from glaredb_spark.sources.files import glob_files

    url, _ = http_url
    assert glob_files(spark, f"{url}/nation.parquet").count() == 1
    assert glob_files(spark, f"{url}/missing.parquet").count() == 0
    with pytest.raises(ValueError, match="glob patterns"):
        glob_files(spark, f"{url}/*.parquet")


def test_glob_hadoop_file_scheme(spark):
    from glaredb_spark.sources.files import glob_files

    got = [
        r.filename
        for r in glob_files(spark, f"file:{SF_SMALL}/nation.parquet").collect()
    ]
    assert len(got) == 1 and got[0].endswith("nation.parquet")


def test_url_map_preserves_cache_identity_and_display(tmp_path, monkeypatch):
    """The URL map fetches from the mirror but caches and displays under
    the ORIGINAL url (slt/http fixture contract)."""
    import functools
    import threading
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    from glaredb_spark.sources import httpfs

    (tmp_path / "f.csv").write_text("a,b\n1,2\n")

    class Quiet(SimpleHTTPRequestHandler):
        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), functools.partial(Quiet, directory=str(tmp_path))
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]
    monkeypatch.setattr(
        httpfs, "_CACHE_DIR", str(tmp_path / "cache"), raising=True
    )
    try:
        httpfs.set_url_map(
            [("https://example.invalid/data/", f"http://{host}:{port}/")]
        )
        url = "https://example.invalid/data/f.csv"
        local = httpfs.http_fetch(url)
        assert open(local).read() == "a,b\n1,2\n"
        assert httpfs.display_url(local) == url
    finally:
        httpfs.set_url_map([])
        server.shutdown()

"""HTTP(S) filesystem support for the file sources.

Reference surface: crates/glaredb_http/src/filesystem.rs (HTTP file reads
used by ``read_parquet('https://...')`` etc.; tested by
slt/http/read_parquet_http.slt and read_csv_http.slt). The reference's HTTP
"filesystem" supports exact-path reads only — no listing — and so does this
one: glob metacharacters in an http(s) URL are an error.

Spark-side design: Hadoop has no http:// FileSystem, so remote objects are
fetched once to a content-addressed local cache (atomic rename, safe under
concurrent sessions) and scanned from there. The fetch is a single stream —
the same shape as the reference's ranged HTTP reads from one origin server;
at cluster scale a shared filesystem or object store (s3a/gcs Hadoop
connectors, see sources/files.py notes) is the real multi-executor path,
and those schemes pass through to Hadoop untouched.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.parse
import urllib.request

_CACHE_DIR = os.environ.get("SPARK_GRAFT_HTTP_CACHE", "/tmp/glaredb_spark_http_cache")
_GLOB_CHARS = set("*?[{")

# url-prefix remapping for environments without internet egress: fetches
# of a mapped prefix go to the replacement (a mirror serving identical
# content — the slt/http fixture serves the repo-local testdata tree),
# while cache identity and display keep the ORIGINAL url, so goldens
# that echo the url (parquet.rowgroup_metadata filename) still match.
_URL_MAP: list[tuple[str, str]] = []
_DISPLAY: dict[str, str] = {}  # local cached path -> original url


def set_url_map(pairs: list[tuple[str, str]]) -> None:
    _URL_MAP[:] = list(pairs)


def _mapped(url: str) -> str:
    for orig, repl in _URL_MAP:
        if url.startswith(orig):
            return repl + url[len(orig):]
    return url


def display_url(local_path: str) -> str | None:
    """Original URL for a cache file http_fetch produced, else None."""
    return _DISPLAY.get(local_path)


def is_http_url(path: str) -> bool:
    return path.startswith(("http://", "https://"))


def http_fetch(url: str) -> str:
    """Download ``url`` to the local cache (once per URL per cache dir) and
    return the local path. Re-used across readers and sessions."""
    if any(c in url for c in _GLOB_CHARS):
        raise ValueError(
            f"HTTP filesystems do not support glob patterns: {url!r} "
            "(reference parity: glaredb_http exact-path reads only)"
        )
    os.makedirs(_CACHE_DIR, exist_ok=True)
    digest = hashlib.sha256(url.encode()).hexdigest()[:24]
    name = os.path.basename(urllib.parse.urlparse(url).path) or "download"
    dest = os.path.join(_CACHE_DIR, f"{digest}_{name}")
    if not os.path.exists(dest):
        tmp = f"{dest}.part.{os.getpid()}"
        try:
            with urllib.request.urlopen(_mapped(url)) as resp, open(
                tmp, "wb"
            ) as out:
                shutil.copyfileobj(resp, out)
            os.replace(tmp, dest)  # atomic: concurrent fetchers converge
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    _DISPLAY[dest] = url
    return dest


def localize(path: str) -> str:
    """Map an http(s) URL to a local cached copy; other paths unchanged."""
    return http_fetch(path) if is_http_url(path) else path

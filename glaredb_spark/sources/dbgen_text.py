"""dbgen text columns: substrings of the grammar text pool.

TPC-H spec §4.2.2.13: every *text string [min, max]* column is a random
substring of a pseudo-text pool generated once from the spec's grammar.
Per value, dbgen draws ``offset = UnifInt(0, POOL - max)`` then
``length = UnifInt(min, max)`` from the column's stream (2 seeds per
value), where min/max = 0.4/1.6 x the column's average length.

Two pool sizes exist in the wild, and the reference's own test data
uses BOTH (same grammar walk and seed; one is a truncation of the
other, but the offset draws scale with the pool, so text values
differ):

- ``POOL_SIZE_FULL`` (300 MiB): TPC's dbgen and the ``tpchgen`` crate
  the reference's tpch_gen extension delegates to. The slt/tpch_gen
  region golden and the slt/tpchbench comment-predicate goldens
  (q13/q16) come from this lineage. This is the default.
- ``POOL_SIZE_SMALL`` (10 MiB): the lineage behind the reference's
  checked-in testdata/csv/tpch_small CSVs (DuckDB's tpch extension).

Both are proven bit-exact in tests/test_dbgen_exact.py. Pools build
once (~2 s small, ~90 s full) and are cached on disk keyed by a
content fingerprint of the distributions + builder source + size, so a
grammar fix can never silently reuse a stale pool; a cross-process
flock serializes cold builds so parallel Spark workers build a node's
pool exactly once.
"""

from __future__ import annotations

import os

import numpy as np

POOL_SIZE_FULL = 300 * 1024 * 1024
POOL_SIZE_SMALL = 10 * 1024 * 1024
POOL_SIZE = POOL_SIZE_FULL  # default: the reference's tpchgen lineage

_POOLS: dict[int, np.ndarray] = {}


def _pool_fingerprint(size: int) -> str:
    """Content hash of everything the pool bytes depend on: the dists
    tables, the builder source, and the size."""
    import hashlib
    import inspect

    from glaredb_spark.sources import dbgen_dists, dbgen_pool

    h = hashlib.sha256()
    h.update(repr({
        k: getattr(dbgen_dists, k)
        for k in sorted(dir(dbgen_dists)) if k.isupper()
    }).encode())
    h.update(inspect.getsource(dbgen_pool).encode())
    h.update(str(size).encode())
    return h.hexdigest()[:16]


def _cache_path(size: int) -> str:
    d = os.environ.get(
        "GLAREDB_SPARK_CACHE", os.path.join("/tmp", "glaredb_spark_cache")
    )
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"dbgen_text_pool_{_pool_fingerprint(size)}.bin")


def _build_locked(path: str, size: int) -> None:
    """Build the pool to ``path`` atomically, serialized across
    processes (Spark workers race on a cold cache)."""
    import fcntl

    lock = path + ".lock"
    with open(lock, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if os.path.exists(path):
                return
            from glaredb_spark.sources.dbgen_pool import build_pool

            tmp = f"{path}.tmp.{os.getpid()}"
            build_pool(tmp, size=size)
            os.replace(tmp, path)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def get_pool(size: int = POOL_SIZE) -> np.ndarray:
    """The text pool as a uint8 numpy view (memory-mapped)."""
    pool = _POOLS.get(size)
    if pool is None:
        path = _cache_path(size)
        if not os.path.exists(path):
            _build_locked(path, size)
        pool = np.memmap(path, dtype=np.uint8, mode="r")
        if pool.shape[0] != size:
            raise RuntimeError(
                f"text pool cache {path} has {pool.shape[0]} bytes, "
                f"expected {size}; delete it to rebuild"
            )
        _POOLS[size] = pool
    return pool


def text_offsets(stream, avg_len: int, per_row: int = 1,
                 pool_size: int = POOL_SIZE):
    """(offsets, lengths) arrays of shape (rows, per_row) — the raw
    draws, exposed for calibration pinning."""
    lo, hi = int(avg_len * 0.4), int(avg_len * 1.6)
    n = len(stream.seeds)
    offsets = np.empty((n, per_row), dtype=np.int64)
    lengths = np.empty((n, per_row), dtype=np.int64)
    for i in range(per_row):
        offsets[:, i] = stream.draw(0, pool_size - hi)
        lengths[:, i] = stream.draw(lo, hi)
    return offsets, lengths


def _extract(pool: np.ndarray, offsets, lengths) -> np.ndarray:
    out = np.empty(offsets.shape, dtype=object)
    flat_o = offsets.reshape(-1)
    flat_l = lengths.reshape(-1)
    flat = out.reshape(-1)
    for i in range(flat_o.shape[0]):
        o = int(flat_o[i])
        flat[i] = pool[o : o + int(flat_l[i])].tobytes().decode("ascii")
    return out


def text_column(stream, avg_len: int,
                pool_size: int = POOL_SIZE) -> np.ndarray:
    offsets, lengths = text_offsets(stream, avg_len, 1, pool_size)
    return _extract(get_pool(pool_size), offsets, lengths)[:, 0]


def text_columns_interleaved(stream, avg_len: int, per_row: int,
                             pool_size: int = POOL_SIZE) -> np.ndarray:
    """k comments per table row from one stream (partsupp: 4 per part,
    lineitem: 7 per order). Shape (rows, per_row)."""
    offsets, lengths = text_offsets(stream, avg_len, per_row, pool_size)
    return _extract(get_pool(pool_size), offsets, lengths)

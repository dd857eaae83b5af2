"""dbgen text columns: substrings of the 300 MB grammar text pool.

TPC-H spec §4.2.2.13: every *text string [min, max]* column is a random
substring of a 300 MB pseudo-text pool generated once from the spec's
grammar. Per value, dbgen draws ``offset = UnifInt(0, POOL - max)``
then ``length = UnifInt(min, max)`` from the column's stream (2 seeds
per value), where min/max = 0.4/1.6 x the column's average length.

The pool itself is built by dbgen_pool.build_pool() (sequential grammar
walk over one LCG stream, seed 933588178) and cached on disk — ~45M
word draws, a one-time cost; every generator run after that memory-maps
the cached bytes.
"""

from __future__ import annotations

import os

import numpy as np

POOL_SIZE = 300 * 1024 * 1024

_POOL: bytes | None = None


def _cache_path() -> str:
    d = os.environ.get(
        "GLAREDB_SPARK_CACHE", os.path.join("/tmp", "glaredb_spark_cache")
    )
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "dbgen_text_pool_300mb.bin")


def get_pool() -> np.ndarray:
    """The 300 MB pool as a uint8 numpy view (memory-mapped)."""
    global _POOL
    if _POOL is None:
        path = _cache_path()
        if not os.path.exists(path):
            from glaredb_spark.sources.dbgen_pool import build_pool

            build_pool(path)
        _POOL = np.memmap(path, dtype=np.uint8, mode="r")
        if _POOL.shape[0] != POOL_SIZE:
            raise RuntimeError(
                f"text pool cache {path} has {_POOL.shape[0]} bytes, "
                f"expected {POOL_SIZE}; delete it to rebuild"
            )
    return _POOL


def text_offsets(stream, avg_len: int, per_row: int = 1):
    """(offsets, lengths) arrays of shape (rows, per_row) — the raw
    draws, exposed for calibration pinning."""
    lo, hi = int(avg_len * 0.4), int(avg_len * 1.6)
    n = len(stream.seeds)
    offsets = np.empty((n, per_row), dtype=np.int64)
    lengths = np.empty((n, per_row), dtype=np.int64)
    for i in range(per_row):
        offsets[:, i] = stream.draw(0, POOL_SIZE - hi)
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


def text_column(stream, avg_len: int) -> np.ndarray:
    offsets, lengths = text_offsets(stream, avg_len, 1)
    return _extract(get_pool(), offsets, lengths)[:, 0]


def text_columns_interleaved(stream, avg_len: int, per_row: int) -> np.ndarray:
    """k comments per table row from one stream (partsupp: 4 per part,
    lineitem: 7 per order). Shape (rows, per_row)."""
    offsets, lengths = text_offsets(stream, avg_len, per_row)
    return _extract(get_pool(), offsets, lengths)

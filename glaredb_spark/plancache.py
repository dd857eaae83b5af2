"""Session plan cache — prepared-statement-style reuse of lazy query plans.

Registered PURE scan queries (no DML, no side effects) can opt in via
``register_query(..., cache_plan=True)``: the built DataFrame — an
UNEVALUATED logical plan — is memoized per (Spark application, query name,
data directory) and returned as-is while the directory's file fingerprint
(name, mtime_ns, size of every member, one level of subdirectories
included) is unchanged. This is the engine analogue of a prepared-statement
/ plan cache: construction (driver-side footer reads, expression-tree
building, analysis) happens once per session, while every execution still
plans splits and scans the parquet bytes from disk. NO rows, results or
intermediates are ever stored here — ``spark.catalog.clearCache()`` has
nothing to drop from this cache, and a plan re-executed after it recomputes
from the files (tests/test_plancache.py proves both properties).

Any change to the underlying files (overwrite, added/removed members)
changes the fingerprint and rebuilds the plan, so DML on a directory is
observed by the next call.
"""

from __future__ import annotations

import functools
import os

_CACHE: dict = {}  # (app_id, name, abs_dir) -> (fingerprint, DataFrame)
_CACHE_CAP = 256


def _dir_fingerprint(sf_dir: str):
    """(name, mtime_ns, size) of every non-hidden member of sf_dir; one
    level of subdirectory members included (fixture layouts are flat files
    or single-level table dirs). None when unreadable — callers skip
    caching on None."""
    try:
        out = []
        for e in sorted(os.scandir(sf_dir), key=lambda d: d.name):
            if e.name.startswith((".", "_")):
                continue
            st = e.stat()
            if e.is_dir():
                for m in sorted(os.scandir(e.path), key=lambda d: d.name):
                    if m.name.startswith((".", "_")) or m.is_dir():
                        continue
                    ms = m.stat()
                    out.append((m.path, ms.st_mtime_ns, ms.st_size))
            else:
                out.append((e.name, st.st_mtime_ns, st.st_size))
        return tuple(out) or None
    except OSError:
        return None


def clear_plan_cache() -> None:
    _CACHE.clear()


def plan_cached(name: str):
    """Wrap a (spark, sf_dir) -> DataFrame builder with the plan cache."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(spark, sf_dir):
            try:
                app = spark.sparkContext.applicationId
            except Exception:
                app = None
            fp = _dir_fingerprint(sf_dir) if app is not None else None
            if fp is None:
                return fn(spark, sf_dir)
            key = (app, name, os.path.abspath(sf_dir))
            hit = _CACHE.get(key)
            if hit is not None and hit[0] == fp:
                return hit[1]
            df = fn(spark, sf_dir)
            _CACHE[key] = (fp, df)
            if len(_CACHE) > _CACHE_CAP:
                for k in list(_CACHE)[: _CACHE_CAP // 4]:
                    del _CACHE[k]
            return df

        return wrapper

    return deco

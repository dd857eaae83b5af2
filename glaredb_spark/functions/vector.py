"""Vector/similarity kernels with cross-engine-deterministic numerics.

Reference surface: ``l2_distance``
(crates/glaredb_core/src/functions/scalar/builtin/similarity/l2_distance.rs)
— extended here to dot product / cosine for the similarity-search operators.

Numerics: float×float products are computed in DOUBLE (exact — a 24-bit
float mantissa product fits a 53-bit double), scaled by 1e12, rounded to
BIGINT (deterministic: both Spark and DuckDB round doubles half-away-from-
zero), and summed as integers — integer addition is exact and associative,
so the result is identical regardless of evaluation order, partitioning, or
engine. Only the final scalar (dot, norm, cosine, distance) returns to
DOUBLE. 64-dim sums of |scaled| ≤ ~1e14 stay far below int64 range.
(A decimal-accumulator variant was rejected: Spark's double→decimal cast
goes through the shortest string representation, which drops low-order
bits DuckDB keeps.)

Two implementations share these numerics, bit-identically:
- JVM higher-order functions (``zip_with`` + ``aggregate``) — zero Python,
  fine for per-row scoring at modest pair counts, and the form the SQL
  surface uses. NOTE: Spark evaluates HOF lambdas interpreted (outside
  whole-stage codegen), ~40 us per 64-dim pair measured — they are NOT the
  fast path.
- Arrow-batched pandas UDFs (``dot_arrow`` / ``cosine_arrow``) — one numpy
  matrix op per batch, ~100x the HOF throughput; used by the
  pair-verification hot paths (millions of candidate pairs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1e12


def _scaled(expr: Column) -> Column:
    return F.round(expr * F.lit(SCALE)).cast("long")


def _sum_long(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, v: acc + v)


def dot(a: Column, b: Column) -> Column:
    """Deterministic dot product of two float/double array columns."""
    prods = F.zip_with(a, b, lambda x, y: _scaled(x.cast("double") * y.cast("double")))
    return _sum_long(prods).cast("double") / F.lit(SCALE)


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance (reference l2_distance.rs semantics)."""
    sq = F.zip_with(
        a,
        b,
        lambda x, y: _scaled(
            (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
    )
    return F.sqrt(_sum_long(sq).cast("double") / F.lit(SCALE))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generators (identical numerics)
# ---------------------------------------------------------------------------

def o_dot(a: str, b: str) -> str:
    return (
        f"(CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
        f"CAST(round(CAST(list_extract({a}, i) AS DOUBLE) * "
        f"CAST(list_extract({b}, i) AS DOUBLE) * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
    )


def o_norm_sq(a: str) -> str:
    return o_dot(a, a)


def o_cosine(a: str, b: str) -> str:
    return f"({o_dot(a, b)} / (sqrt({o_norm_sq(a)}) * sqrt({o_norm_sq(b)})))"


# ---------------------------------------------------------------------------
# Arrow-vectorized kernel (identical numerics, ~100x the HOF throughput)
#
# Spark's higher-order functions (zip_with/aggregate) are NOT part of
# whole-stage codegen — they evaluate interpreted, per element (~40 us per
# 64-dim pair measured on local[32]). For pair-verification hot paths
# (millions of candidate pairs) the Arrow-batched kernel below stacks each
# batch into one (rows x dim) float64 matrix and does the scaled-integer
# dot in numpy. Rounding is explicitly half-away-from-zero (sign*floor(
# abs+0.5)) to match Spark round()/DuckDB round() — numpy's own round()
# is half-to-even and would diverge on exact .5 products. Integer sums
# keep the result order- and partition-invariant, bit-identical to the
# HOF kernels above (asserted in tests).
# ---------------------------------------------------------------------------

def _scaled_dot_np(a_col, b_col):
    import numpy as np

    a = np.vstack(a_col.to_numpy()).astype(np.float64)
    b = np.vstack(b_col.to_numpy()).astype(np.float64)
    prods = a * b * SCALE
    scaled = (np.sign(prods) * np.floor(np.abs(prods) + 0.5)).astype(np.int64)
    return scaled.sum(axis=1) / SCALE


def flat_matrix(arr):
    """pyarrow ListArray (embedding column) → (n, dim) float64 matrix.

    Fast path: when every list has the same length and no row is null, the
    child values buffer is reshaped directly (zero object-per-row cost —
    the `np.vstack(series.to_numpy())` route materializes one numpy object
    PER ROW during the Arrow→pandas conversion, which dominates kernels fed
    millions of rows). Ragged/null inputs fall back to the per-row path.
    Returns (matrix, lengths) so ragged callers can still slice."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import in workers

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    lens = pa.compute.list_value_length(arr).to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64), lens
    if arr.null_count == 0 and lens.min() == lens.max():
        dim = int(lens[0])
        vals = np.asarray(arr.flatten(), dtype=np.float64)
        return vals.reshape(n, dim), lens
    rows = arr.to_pylist()
    dim = int(max((len(r) for r in rows if r is not None), default=0))
    out = np.zeros((n, dim), dtype=np.float64)
    for i, r in enumerate(rows):
        if r:
            out[i, : len(r)] = np.asarray(r, dtype=np.float64)
    return out, lens


def scaled_self_norms(mat):
    """Per-row sqrt(scaled-int self dot) — identical bits to
    sqrt(norm_sq(row)) from the HOF kernel (same element products, same
    half-away rounding, same int64 sum, one IEEE sqrt)."""
    import numpy as np

    prods = mat * mat * SCALE
    scaled = (np.sign(prods) * np.floor(np.abs(prods) + 0.5)).astype(np.int64)
    return np.sqrt(scaled.sum(axis=1) / SCALE)


def scaled_row_dots(A, B):
    """Row-wise scaled-integer dots d[i] = dot(A[i], B[i]) — the same
    in-place half-away rounding discipline as scaled_cross_dots, over the
    2D row-pair layout (used by fused score kernels fed pre-joined pair
    batches). Bit-identical to the HOF ``dot`` column."""
    import numpy as np

    prods = A * B
    prods *= SCALE
    neg = np.signbit(prods)
    np.abs(prods, out=prods)
    prods += 0.5
    np.floor(prods, out=prods)
    np.negative(prods, where=neg, out=prods)
    return prods.astype(np.int64).sum(axis=1) / SCALE


def scaled_cross_dots(P, M, chunk_elems: int = 524_288):
    """All-pairs scaled-integer dot matrix D[i, j] = dot(P[i], M[j]) under
    the module's rounding discipline (per-element round happens BEFORE the
    sum, so a plain matmul is NOT equivalent). Evaluates the (|P|, |M|,
    dim) product tensor in row chunks, rounding IN PLACE: the naive
    ``sign(p) * floor(abs(p) + 0.5)`` chain allocates three tensor-sized
    temporaries per call, and the allocation/page-fault cost of cold
    ~32 MB buffers dominated the whole kernel when each Spark task ran it
    fresh (measured 3.2 s cold vs 0.065 s warm for one 250² bucket).
    Small chunks keep every temporary a few MB so numpy's free lists
    recycle them across chunks and buckets. Identical values: negate-
    where-signbit(floor(abs+0.5)) is the same half-away-from-zero map,
    and chunking only partitions rows. Float64 in, float64 dots out
    (scaled int64 sums / SCALE)."""
    import numpy as np

    n_p, dim = P.shape
    n_m = M.shape[0]
    D = np.empty((n_p, n_m), dtype=np.float64)
    step = max(1, chunk_elems // max(1, n_m * dim))
    for s in range(0, n_p, step):
        e = min(n_p, s + step)
        prods = P[s:e, None, :] * M[None, :, :]
        prods *= SCALE
        neg = np.signbit(prods)
        np.abs(prods, out=prods)
        prods += 0.5
        np.floor(prods, out=prods)
        np.negative(prods, where=neg, out=prods)
        D[s:e] = prods.astype(np.int64).sum(axis=2) / SCALE
    return D


import pandas as _pd

# Built lazily (pandas_udf needs an active session) and keyed by the active
# SparkSession: a module-global cached across sessions would hand back UDFs
# bound to a stopped session's state after spark.stop()/getOrCreate().
_ARROW_UDFS: dict = {}


def _arrow_udfs():
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    import weakref

    # keyed by a weakref with identity check — a bare id() can be reused
    # by a NEW session after the old one is GC'd (ADVICE r3), serving
    # stale UDFs; a dead ref or None session always rebuilds
    sess = SparkSession.getActiveSession()
    ref = _ARROW_UDFS.get("session_ref")
    if sess is not None and ref is not None and ref() is sess:
        return _ARROW_UDFS
    _ARROW_UDFS.clear()
    _ARROW_UDFS["session_ref"] = (
        weakref.ref(sess) if sess is not None else None
    )

    @pandas_udf(DoubleType())
    def _dot_arrow_udf(xa: _pd.Series, xb: _pd.Series) -> _pd.Series:
        if not len(xa):
            return _pd.Series([], dtype="float64")
        return _pd.Series(_scaled_dot_np(xa, xb))

    @pandas_udf(DoubleType())
    def _cosine_arrow_udf(xa: _pd.Series, xb: _pd.Series) -> _pd.Series:
        import numpy as np

        if not len(xa):
            return _pd.Series([], dtype="float64")
        d = _scaled_dot_np(xa, xb)
        na = np.sqrt(_scaled_dot_np(xa, xa))
        nb = np.sqrt(_scaled_dot_np(xb, xb))
        return _pd.Series(d / (na * nb))

    _ARROW_UDFS.update(dot=_dot_arrow_udf, cosine=_cosine_arrow_udf)
    return _ARROW_UDFS


def dot_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized ``dot`` — same scaled-integer numerics as ``dot``."""
    return _arrow_udfs()["dot"](a, b)


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine — dot and both norms in one pass per batch."""
    return _arrow_udfs()["cosine"](a, b)


def o_l2(a: str, b: str) -> str:
    return (
        f"sqrt(CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
        f"CAST(round((CAST(list_extract({a}, i) AS DOUBLE) - CAST(list_extract({b}, i) AS DOUBLE)) * "
        f"(CAST(list_extract({a}, i) AS DOUBLE) - CAST(list_extract({b}, i) AS DOUBLE)) * 1e12) "
        f"AS BIGINT))) AS DOUBLE) / 1e12)"
    )

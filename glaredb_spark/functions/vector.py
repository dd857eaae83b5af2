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

Everything is a JVM higher-order function (``zip_with`` + ``aggregate``) —
no Python UDF, no explode-induced row blowup; at 100 TB the dot product is
a per-row map operation inside whole-stage codegen.
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


def o_l2(a: str, b: str) -> str:
    return (
        f"sqrt(CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> "
        f"CAST(round((CAST(list_extract({a}, i) AS DOUBLE) - CAST(list_extract({b}, i) AS DOUBLE)) * "
        f"(CAST(list_extract({a}, i) AS DOUBLE) - CAST(list_extract({b}, i) AS DOUBLE)) * 1e12) "
        f"AS BIGINT))) AS DOUBLE) / 1e12)"
    )

"""Scalar function registry — every reference scalar function under its
GlareDB name, as PySpark Column expressions.

Reference registry: crates/glaredb_core/src/functions/scalar/builtin/mod.rs
:130-160 (names/aliases registered into the system catalog at
catalog/system.rs:42-58). Most map 1:1 onto pyspark.sql.functions (JVM-side,
codegen'd); composites are built from JVM primitives — no Python UDFs except
gcd/lcm (documented slow path, Spark has no builtin).

Usage::

    from glaredb_spark.functions.scalar import fn
    df.select(fn["l2_distance"](df.a, df.b), fn["strpos"](df.s, lit("x")))
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from glaredb_spark.functions import vector as _vec

_INF = float("inf")


def _isfinite(c):
    c = c.cast("double")
    return ~(F.isnan(c) | (F.abs(c) == F.lit(_INF)))


def _isinf(c):
    return F.abs(c.cast("double")) == F.lit(_INF)


def _epoch(seconds):
    """Unix seconds → TIMESTAMP (reference datetime/epoch.rs:
    `epoch(1675209600)` = 2023-02-01 00:00:00; alias epoch_s). NOTE the
    direction: the reference CONSTRUCTS a timestamp (DuckDB's epoch() is
    the inverse) — caught by running slt/standard/functions/scalar/
    datetime/epoch.slt through the SLT runner."""
    return F.timestamp_seconds(seconds.cast("long"))


def _epoch_ms(millis):
    """Unix milliseconds → TIMESTAMP (reference datetime/epoch.rs)."""
    return F.timestamp_millis(millis.cast("long"))


def _struct_extract(s, field: str):
    return s.getField(field)


def _list_extract(arr, i):
    """1-indexed list extract (reference list/list_extract.rs)."""
    return F.element_at(arr, i)


# name -> callable(Column...) -> Column; mirrors the reference registry
fn: dict[str, object] = {
    # arith (arith/): operators work directly on Columns; named forms:
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "rem": lambda a, b: a % b,
    "negate": lambda a: -a,
    # binary/bit (binary.rs)
    "xor": lambda a, b: a.bitwiseXOR(b),
    "shl": F.shiftleft,
    "shr": F.shiftright,
    # boolean (boolean.rs)
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "not": lambda a: ~a,
    # comparison (comparison.rs)
    "eq": lambda a, b: a == b,
    "neq": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "is_not_distinct_from": lambda a, b: a.eqNullSafe(b),
    "is_distinct_from": lambda a, b: ~a.eqNullSafe(b),
    # is checks (is.rs)
    "is_null": lambda a: a.isNull(),
    "is_not_null": lambda a: a.isNotNull(),
    "is_true": lambda a: a.eqNullSafe(F.lit(True)),
    "is_false": lambda a: a.eqNullSafe(F.lit(False)),
    # datetime (datetime/)
    "date_part": F.date_part,
    "date_trunc": F.date_trunc,
    "epoch": _epoch,
    "epoch_ms": _epoch_ms,
    # numeric (numeric/, 36 files)
    "abs": F.abs,
    "acos": F.acos,
    "acosh": F.acosh,
    "asin": F.asin,
    "asinh": F.asinh,
    "atan": F.atan,
    "atan2": F.atan2,
    "atanh": F.atanh,
    "cbrt": F.cbrt,
    "ceil": F.ceil,
    "cos": F.cos,
    "cosh": F.cosh,
    "cot": F.cot,
    "degrees": F.degrees,
    "exp": F.exp,
    "factorial": F.factorial,
    "floor": F.floor,
    "isfinite": _isfinite,
    "isinf": _isinf,
    "isnan": F.isnan,
    "ln": F.log,
    "log": F.log10,  # reference log == log10 (numeric/log.rs)
    "log2": F.log2,
    "pi": lambda: F.lit(math.pi),
    "power": F.power,
    "radians": F.radians,
    "round": F.round,
    "sign": F.signum,
    "sin": F.sin,
    "sinh": F.sinh,
    "sqrt": F.sqrt,
    "tan": F.tan,
    "tanh": F.tanh,
    "trunc": lambda c: c.cast("long"),
    # random (random.rs)
    "random": F.rand,
    # similarity (similarity/l2_distance.rs) + extensions
    "l2_distance": _vec.l2_distance,
    "dot_product": _vec.dot,
    "cosine_similarity": _vec.cosine_similarity,
    # string (string/)
    "ascii": F.ascii,
    "bit_length": F.bit_length,
    "btrim": lambda s, t=None: F.btrim(s, t) if t is not None else F.btrim(s),
    "byte_length": F.octet_length,
    "concat": F.concat,
    "contains": lambda s, sub: F.contains(s, sub),
    "ends_with": lambda s, suf: F.endswith(s, suf),
    "initcap": F.initcap,
    "length": F.length,
    "like": lambda s, pat: s.like(pat),
    "lower": F.lower,
    "lpad": F.lpad,
    "ltrim": F.ltrim,
    "md5": F.md5,
    "regexp_count": F.regexp_count,
    "regexp_instr": F.regexp_instr,
    "regexp_like": F.regexp_like,
    "regexp_replace": F.regexp_replace,
    "repeat": F.repeat,
    "replace": F.replace,
    "reverse": F.reverse,
    "rpad": F.rpad,
    "rtrim": F.rtrim,
    "split_part": F.split_part,
    "starts_with": lambda s, pre: F.startswith(s, pre),
    "strpos": lambda s, sub: F.instr(s, sub),
    "substring": F.substring,
    "translate": F.translate,
    "trim": F.trim,
    "upper": F.upper,
    # list (list/)
    "list_extract": _list_extract,
    "list_value": lambda *cols: F.array(*cols),
    # struct (struct_funcs.rs)
    "struct_extract": _struct_extract,
    "struct_pack": lambda **kw: F.struct(*[v.alias(k) for k, v in kw.items()]),
    # expression forms (case/between/cast/coalesce are native Column methods)
    "coalesce": F.coalesce,
    "between": lambda c, lo, hi: c.between(lo, hi),
    "grouping": F.grouping,
    # spark-compat extension fns (glaredb_ext_spark/src/functions/)
    "csc": F.csc,
    "expm1": F.expm1,
}

fn["left"] = lambda s, n: F.substring(s, 1, n)


def _right(s, n):
    # Clamp start to >= 1: length(s) - n + 1 goes negative when n > len+1,
    # and Spark's substr treats negative positions as counting from the end
    # (right('abc', 5) would return 'c' instead of 'abc') — ADVICE r1.
    n = F.lit(n) if isinstance(n, int) else n
    return F.substr(s, F.greatest(F.length(s) - n + 1, F.lit(1)), n)


fn["right"] = _right


def gcd_udf():
    """math.gcd as a vectorized pandas UDF — Spark has no builtin gcd/lcm.
    Documented slow path (Arrow-batched, not per-row)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _gcd(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [math.gcd(int(x), int(y)) if x is not None and y is not None else None
             for x, y in zip(a, b)]
        )

    return _gcd


def lcm_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _lcm(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [math.lcm(int(x), int(y)) if x is not None and y is not None else None
             for x, y in zip(a, b)]
        )

    return _lcm


def pg_regexp_replace_udf():
    """Reference regexp_replace semantics (string/regexp_replace.rs, Rust
    ``Regex::replace``): replaces the FIRST match only (Spark/Java
    replaces all), `\\N` backreferences where a nonexistent group expands
    to empty (Python re raises), and `\\\\` escapes a literal backslash.
    Arrow-batched pandas UDF — cold-path function, per-row regex columns
    supported."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _expand(m: "_re.Match", template: str) -> str:
        out, i, n = [], 0, len(template)
        while i < n:
            ch = template[i]
            if ch == "\\" and i + 1 < n:
                nxt = template[i + 1]
                if nxt == "\\":
                    out.append("\\")
                    i += 2
                    continue
                if nxt.isdigit():
                    idx = int(nxt)
                    try:
                        out.append(m.group(idx) or "")
                    except (IndexError, _re.error):
                        pass
                    i += 2
                    continue
            out.append(ch)
            i += 1
        return "".join(out)

    @pandas_udf("string")
    def _rr(s: pd.Series, p: pd.Series, r: pd.Series) -> pd.Series:
        def one(val, pat, rep):
            if val is None or pat is None or rep is None:
                return None
            try:
                rx = _re.compile(pat)
            except _re.error:
                return None
            return rx.sub(lambda m: _expand(m, rep), val, count=1)

        return pd.Series([one(v, q, w) for v, q, w in zip(s, p, r)])

    return _rr


def pg_initcap_udf():
    """Reference initcap: a new word starts after ANY non-alphanumeric
    char ('hello-world' -> 'Hello-World', initcap.slt); Spark's builtin
    only splits on whitespace. Arrow-batched pandas UDF, cold path."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    word = _re.compile(r"[A-Za-z0-9]+")

    @pandas_udf("string")
    def _ic(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                word.sub(lambda m: m.group(0).capitalize(), v) if v is not None else None
                for v in s
            ]
        )

    return _ic

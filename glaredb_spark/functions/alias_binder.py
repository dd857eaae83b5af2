"""Partial column-alias lists on derived relations.

Reference surface: table aliases may rename FEWER columns than the
relation produces — ``(SELECT 1 AS a, 2) AS t(b)`` names the first
column b and keeps the generated name for the rest (Postgres rule;
slt/standard/{simple,values/values_aliases,subqueries/subquery_alias}.slt).
Spark requires the alias list to cover every column, so this pre-binder
pads short lists with the relation's own remaining column names, resolved
from the analyzed probe of the inner relation (analysis only — nothing
executes).

Only parenthesized derived relations (SELECT/VALUES bodies) are padded;
table-function aliases like ``generate_series(1, 5) AS g(x)`` and scalar
calls are left alone. Literal/comment spans are never touched.
"""

from __future__ import annotations

import re

from glaredb_spark.functions.arith_binder import _find_literal_spans

_ALIAS_AFTER_PAREN_RE = re.compile(
    r"\)\s*(?:AS\s+)?(\w+)\s*\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)",
    re.IGNORECASE,
)


def _mask(sql: str) -> str:
    chars = list(sql)
    for a, b in _find_literal_spans(sql):
        for i in range(a, min(b, len(chars))):
            chars[i] = "\x00"
    return "".join(chars)


def _matching_open(masked: str, close_pos: int) -> int | None:
    depth = 0
    for i in range(close_pos, -1, -1):
        if masked[i] == ")":
            depth += 1
        elif masked[i] == "(":
            depth -= 1
            if depth == 0:
                return i
    return None


def pad_partial_alias_lists(sql: str, spark) -> str:
    """Expand ``(<derived>) v(a)`` to ``(<derived>) v(a, <rest...>)``
    whenever the alias list is shorter than the relation's column list."""
    if "(" not in sql:
        return sql
    masked = _mask(sql)
    # iterate right-to-left so span replacements don't shift earlier offsets
    matches = list(_ALIAS_AFTER_PAREN_RE.finditer(masked))
    for m in reversed(matches):
        close_pos = m.start()  # position of the ')'
        open_pos = _matching_open(masked, close_pos)
        if open_pos is None:
            continue
        inner = sql[open_pos + 1 : close_pos]
        head = inner.lstrip().upper()
        if not (head.startswith("SELECT") or head.startswith("VALUES")
                or head.startswith("WITH")):
            continue  # function-call parens, not a derived relation
        given = [a.strip() for a in m.group(2).split(",")]
        try:
            cols = spark.sql(f"SELECT * FROM ({inner})").columns
        except Exception:  # noqa: BLE001 — leave unpaddable SQL unchanged
            continue
        if len(given) >= len(cols):
            continue
        padded = given + [f"`{c}`" for c in cols[len(given) :]]
        alias_span_start = m.start(2)
        alias_span_end = m.end(2)
        sql = sql[:alias_span_start] + ", ".join(padded) + sql[alias_span_end:]
        masked = _mask(sql)
    return sql

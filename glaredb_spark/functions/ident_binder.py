"""Reference identifier-resolution model under case-sensitive storage.

The reference stores column names case-sensitively but resolves unquoted
identifiers case-insensitively; double quotes force an exact match, and an
unquoted identifier matching two stored columns that differ only by case is
an error (crates/glaredb_core/src/logical/binder/bind_context.rs lookup;
slt/standard/ident/case_sensitivity_ambiguous.slt: ``"Bcolumn"``/
``"bcolumn"`` coexist, ``SELECT bcolumn`` → "Ambiguous column name").

Spark offers only the two global modes (``spark.sql.caseSensitive``), so the
reference model is recreated as a pre-binder that activates ONLY while the
session runs case-sensitively: a ``CREATE TABLE`` whose declared columns
collide case-insensitively flips the session into case-sensitive mode
(GlareSession.sql), and from then on this binder resolves every bare
identifier against the in-scope table schemas — unique case-insensitive
match → replaced with the exact backticked name; several matches → the
reference's ambiguity error. Backtick-quoted identifiers (the rewritten
form of the reference's double quotes) are left exact.

Scale note: resolution is a driver-side string pass plus catalog schema
lookups (cached by Spark) — nothing per-row.
"""

from __future__ import annotations

import re

from glaredb_spark.functions.arith_binder import (
    _find_literal_spans,
    _in_spans,
    _split_top_args,
)

__all__ = [
    "AmbiguousColumnError",
    "create_has_case_dup_columns",
    "resolve_case_idents",
]


class AmbiguousColumnError(ValueError):
    """Unquoted identifier matches multiple stored columns differing only
    by case (reference bind error)."""


_CREATE_COLS_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?[\w.`\"]+\s*\(",
    re.IGNORECASE,
)
_TABLE_REF_RE = re.compile(
    r"\b(?:FROM|JOIN|INTO|TABLE)\s+([A-Za-z_]\w*)", re.IGNORECASE
)
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")


def _first_token(item: str) -> str:
    item = item.strip()
    if item.startswith("`"):
        end = item.find("`", 1)
        return item[1:end] if end > 0 else item
    if item.startswith('"'):
        end = item.find('"', 1)
        return item[1:end] if end > 0 else item
    m = _IDENT_RE.match(item)
    return m.group() if m else ""


def create_has_case_dup_columns(sql: str) -> bool:
    """True when a CREATE TABLE column list declares names that collide
    case-insensitively (the shape that requires case-sensitive storage)."""
    m = _CREATE_COLS_RE.match(sql)
    if not m:
        return False
    depth, i, n = 1, m.end(), len(sql)
    while i < n and depth:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    names = [
        _first_token(a) for a in _split_top_args(sql[m.end() : i - 1])
    ]
    names = [x for x in names if x]
    return len({x.lower() for x in names}) < len(names)


def resolve_case_idents(sql: str, spark) -> str:
    """Resolve bare identifiers case-insensitively against the columns of
    every table referenced in FROM/JOIN/INTO position. Only called while
    the session is case-sensitive (see module docstring)."""
    colmap: dict[str, set[str]] = {}
    tables: set[str] = set()
    for m in _TABLE_REF_RE.finditer(sql):
        tables.add(m.group(1).lower())
        try:
            cols = spark.table(m.group(1)).columns
        except Exception:  # noqa: BLE001 — TVF / not-a-table refs
            continue
        for c in cols:
            colmap.setdefault(c.lower(), set()).add(c)
    if not colmap:
        return sql
    spans = _find_literal_spans(sql)  # masks '...' and `...`
    out: list[str] = []
    last = 0
    n = len(sql)
    for m in _IDENT_RE.finditer(sql):
        if _in_spans(m.start(), spans):
            continue
        word = m.group()
        lw = word.lower()
        if lw not in colmap or lw in tables:
            continue
        exacts = colmap[lw]
        if word in exacts and len(exacts) == 1:
            continue  # already exact and unambiguous
        j = m.end()
        while j < n and sql[j].isspace():
            j += 1
        if j < n and sql[j] == "(":
            continue  # function call, not a column reference
        if len(exacts) > 1:
            raise AmbiguousColumnError(f"Ambiguous column name '{word}'")
        out.append(sql[last : m.start()])
        out.append(f"`{next(iter(exacts))}`")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)

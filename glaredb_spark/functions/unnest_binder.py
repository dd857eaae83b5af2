"""UNNEST pre-binder — the reference's unnest surface on Spark.

The reference supports unnest in two positions
(crates/glaredb_core/src/logical/binder/bind_query/bind_select_list.rs +
plan_unnest.rs; slt/standard/select/unnest.slt,
slt/standard/functions/table/unnest_list.slt):

1. **Select list**, with Postgres-style semantics Spark's `explode`
   cannot express directly:
   - multiple unnests ZIP positionally, shorter arrays padded with NULL
     (``unnest([3,4,5]), unnest([3,2])`` → (3,3),(4,2),(5,NULL));
   - NULL / empty arrays contribute zero rows alone, NULL columns when
     zipped with a longer array;
   - unnest may sit INSIDE expressions (``unnest(xs) + 3``,
     ``repeat(unnest(a), unnest(b))``) and inside aggregates
     (``sum(unnest(a))`` aggregates over all produced rows).

   Spark-first plan: project each distinct unnest argument once
   (``coalesce(arg, array()) AS __uaN``), LATERAL VIEW explode one
   ``arrays_zip(__ua0, ..)`` (arrays_zip pads to the longest — exactly
   the reference's zip), then evaluate the original select items with
   ``unnest(arg)`` replaced by ``__uzip.__uaN``. One generator, no
   row-count ambiguity, aggregations and ORDER BY stay in the outer
   SELECT.

2. **FROM position** (table function), standalone or comma-correlated:
   ``FROM unnest(v.a) u`` → ``LATERAL VIEW explode(coalesce(v.a,
   array())) u AS unnest`` (correlated), or an inline subquery aliasing
   the exploded column ``unnest`` (standalone).

Literal/comment safety via arith_binder's span masking.
"""

from __future__ import annotations

import re

from glaredb_spark.functions.arith_binder import (
    _find_literal_spans,
    _in_spans,
)

__all__ = ["rewrite_unnest"]

_UNNEST_CALL_RE = re.compile(r"\bunnest\s*\(", re.IGNORECASE)


def _match_paren(sql: str, open_pos: int, spans=None) -> int:
    depth, i, n = 0, open_pos, len(sql)
    spans = _find_literal_spans(sql) if spans is None else spans
    while i < n:
        if _in_spans(i, spans):
            i += 1
            continue
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _top_level_positions(sql: str, word_re: re.Pattern) -> list[re.Match]:
    """Matches of word_re at paren-depth 0, outside literals."""
    spans = _find_literal_spans(sql)
    depth = 0
    out = []
    i, n = 0, len(sql)
    matches = {m.start(): m for m in word_re.finditer(sql)}
    while i < n:
        if _in_spans(i, spans):
            i += 1
            continue
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and i in matches:
            out.append(matches[i])
        i += 1
    return out


def _split_top_commas(s: str) -> list[str]:
    spans = _find_literal_spans(s)
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(s):
        if _in_spans(i, spans):
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return parts


# --- FROM-position -----------------------------------------------------------

_FROM_UNNEST_RE = re.compile(
    r"(,|\bFROM\b|\bJOIN\b)(\s*)unnest\s*\(", re.IGNORECASE
)
_ALIAS_RE = re.compile(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", re.IGNORECASE)
_CLAUSE_KWS = {
    "where", "group", "order", "limit", "having", "union", "except",
    "intersect", "on", "join", "inner", "left", "right", "full", "cross",
    "lateral", "as",
}


_FROM_KW_RE = re.compile(r"\bFROM\b", re.IGNORECASE)
_FROM_END_RE = re.compile(
    r"\b(WHERE|GROUP\s+BY|ORDER\s+BY|LIMIT|HAVING|UNION|EXCEPT|INTERSECT"
    r"|WINDOW)\b",
    re.IGNORECASE,
)


def _from_clause_span(sql: str) -> tuple[int, int] | None:
    """(start, end) of the top-level FROM clause body, or None."""
    froms = _top_level_positions(sql, _FROM_KW_RE)
    if not froms:
        return None
    start = froms[0].end()
    ends = [
        b.start()
        for b in _top_level_positions(sql, _FROM_END_RE)
        if b.start() > start
    ]
    return start, (min(ends) if ends else len(sql))


def _rewrite_from_unnest(sql: str) -> str:
    while True:
        spans = _find_literal_spans(sql)
        fspan = _from_clause_span(sql)
        # comma-join rewrites only apply to depth-0 commas inside the
        # top-level FROM clause; FROM/JOIN-anchored matches anywhere
        depth0 = set()
        depth = 0
        for i, ch in enumerate(sql):
            if _in_spans(i, spans):
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                depth0.add(i)
        m = None
        for cand in _FROM_UNNEST_RE.finditer(sql):
            if _in_spans(cand.start(), spans):
                continue
            if cand.group(1) == ",":
                if (
                    fspan is None
                    or cand.start() not in depth0
                    or not (fspan[0] <= cand.start() < fspan[1])
                ):
                    continue
            m = cand
            break
        if m is None:
            return sql
        open_pos = sql.index("(", m.end() - 1)
        close = _match_paren(sql, open_pos, spans)
        if close < 0:
            return sql
        arg = sql[open_pos + 1 : close]
        # optional table alias after the call
        alias, alias_end = None, close + 1
        am = _ALIAS_RE.match(sql, close + 1)
        if am and am.group(1).lower() not in _CLAUSE_KWS:
            alias, alias_end = am.group(1), am.end()
        lead = m.group(1)
        if lead == ",":
            # comma-correlated: lateral unnest over the preceding table
            repl = (
                f" LATERAL VIEW explode(coalesce(({arg}), array())) "
                f"{alias or '__ulat'} AS unnest"
            )
            sql = sql[: m.start()] + repl + sql[alias_end:]
        else:
            # standalone table: inline subquery, column named unnest
            repl = (
                f"{lead} (SELECT explode(coalesce(({arg}), array())) "
                f"AS unnest) AS {alias or '__unnest_t'}"
            )
            sql = sql[: m.start()] + repl + sql[alias_end:]


# --- select list -------------------------------------------------------------

_SELECT_HEAD_RE = re.compile(r"^\s*SELECT\s+", re.IGNORECASE)
_TAIL_KW_RE = re.compile(
    r"\b(FROM|ORDER\s+BY|LIMIT|GROUP\s+BY|HAVING|UNION|EXCEPT|INTERSECT"
    r"|WINDOW)\b",
    re.IGNORECASE,
)


def _find_unnest_calls(item: str) -> list[tuple[int, int, str]]:
    """(start, end_exclusive, arg) for each unnest(...) call in item."""
    spans = _find_literal_spans(item)
    out = []
    for m in _UNNEST_CALL_RE.finditer(item):
        if _in_spans(m.start(), spans):
            continue
        close = _match_paren(item, m.end() - 1, spans)
        if close < 0:
            continue
        out.append((m.start(), close + 1, item[m.end() : close]))
    return out


def _rewrite_select_unnest(sql: str) -> str:
    head = _SELECT_HEAD_RE.match(sql)
    if not head:
        return sql
    # top-level clause boundaries
    bounds = _top_level_positions(sql, _TAIL_KW_RE)
    bounds = [b for b in bounds if b.start() >= head.end()]
    kw = {b.group(1).upper().split()[0]: b for b in bounds}
    if any(k in kw for k in ("GROUP", "HAVING", "UNION", "EXCEPT",
                             "INTERSECT", "WINDOW")):
        return sql  # out of scope for the zip rewrite
    list_end = min(
        (b.start() for b in bounds), default=len(sql)
    )
    select_list = sql[head.end() : list_end]
    if re.match(r"\s*DISTINCT\b", select_list, re.IGNORECASE):
        return sql
    items = _split_top_commas(select_list)
    if any(it.strip() == "*" or it.strip().endswith(".*") for it in items):
        return sql
    per_item = [_find_unnest_calls(it) for it in items]
    if not any(per_item):
        return sql

    # distinct args, in first-appearance order
    args: list[str] = []
    keys: dict[str, int] = {}
    for calls in per_item:
        for _, _, a in calls:
            k = " ".join(a.split())
            if k not in keys:
                keys[k] = len(args)
                args.append(a.strip())

    new_items = []
    for it, calls in zip(items, per_item):
        if not calls:
            new_items.append(it.strip())
            continue
        out, last = [], 0
        for s, e, a in calls:
            out.append(it[last:s])
            out.append(f"__uzip.__ua{keys[' '.join(a.split())]}")
            last = e
        out.append(it[last:])
        new_it = "".join(out).strip()
        # whole-item bare call with no alias → the reference names it
        # `unnest`
        lone = len(calls) == 1 and it.strip() == it[calls[0][0] : calls[0][1]].strip()
        if lone:
            new_it += " AS unnest"
        new_items.append(new_it)

    from_part = ""
    tail = ""
    if "FROM" in kw:
        from_start = kw["FROM"].start()
        tail_start = min(
            (b.start() for b in bounds if b.group(1).upper().split()[0]
             in ("ORDER", "LIMIT")),
            default=len(sql),
        )
        from_part = sql[from_start:tail_start].strip()
        tail = sql[tail_start:].strip()
    else:
        tail_start = min(
            (b.start() for b in bounds if b.group(1).upper().split()[0]
             in ("ORDER", "LIMIT")),
            default=len(sql),
        )
        tail = sql[tail_start:].strip()

    aliased = ", ".join(
        f"coalesce(({a}), array()) AS __ua{i}" for i, a in enumerate(args)
    )
    zip_args = ", ".join(f"__ua{i}" for i in range(len(args)))
    if from_part:
        inner = f"SELECT *, {aliased} {from_part}"
    else:
        inner = f"SELECT {aliased}"
    mid = (
        f"SELECT * FROM ({inner}) __uinner "
        f"LATERAL VIEW explode(arrays_zip({zip_args})) __ulv AS __uzip"
    )
    out_sql = f"SELECT {', '.join(new_items)} FROM ({mid}) __uexp"
    if tail:
        out_sql += f" {tail}"
    return out_sql


def rewrite_unnest(sql: str) -> str:
    if "unnest" not in sql.lower():
        return sql
    prefix = ""
    m = re.match(r"^\s*DESCRIBE\s+", sql, re.IGNORECASE)
    if m:
        prefix, sql = sql[: m.end()], sql[m.end() :]
    sql = _rewrite_from_unnest(sql)
    sql = _rewrite_select_unnest(sql)
    return prefix + sql

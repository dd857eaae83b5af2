"""Implicit-lateral binding, retried on analysis failure.

Reference surface: the reference binds comma-joined FROM items with
visibility of the items to their left — a parenthesized subquery or a
VALUES clause may reference columns of earlier relations WITHOUT the
LATERAL keyword (slt/standard/join/lateral_join.slt,
join/lateral_left_join.slt, values/lateral_values.slt,
subqueries/correlated_lateral.slt). Spark requires an explicit LATERAL,
and its inline tables (VALUES) cannot hold outer references at all.

Rather than guess correlation up front, GlareSession.sql retries a failed
analysis through ``lateralize``:

- ``VALUES (r1), (r2)`` groups inside FROM clauses become
  ``(SELECT r1 UNION ALL SELECT r2)`` — semantically identical, and a
  plain SELECT may carry outer references where an inline table may not;
- comma-joined parenthesized subqueries get the LATERAL keyword
  (``, (SELECT ...)`` → ``, LATERAL (SELECT ...)``);
- ``[LEFT|INNER|CROSS] JOIN (SELECT ...)`` gets LATERAL the same way.

If the retried form fails too, the ORIGINAL error is re-raised — the
binder can only turn failures into successes, never change a working
query (it is not applied to SQL that analyzes clean).
"""

from __future__ import annotations

import re

from glaredb_spark.functions.arith_binder import _find_literal_spans

_FROM_RE = re.compile(r"\bFROM\b", re.IGNORECASE)
_SEG_END_RE = re.compile(
    r"\b(WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|OFFSET|UNION|EXCEPT|INTERSECT|WINDOW)\b",
    re.IGNORECASE,
)
_VALUES_RE = re.compile(r"\bVALUES\b", re.IGNORECASE)
_COMMA_SUBQ_RE = re.compile(r",(\s*)\(\s*SELECT\b", re.IGNORECASE)
_JOIN_SUBQ_RE = re.compile(
    r"\b(JOIN)(\s*)\(\s*SELECT\b", re.IGNORECASE
)


def _mask(sql: str) -> str:
    chars = list(sql)
    for a, b in _find_literal_spans(sql):
        for i in range(a, min(b, len(chars))):
            chars[i] = "\x00"
    return "".join(chars)


def _split_rows(body: str) -> list[str] | None:
    """Split 'VALUES (r1), (r2)' row groups; returns the inner item text
    of each row, or None if the shape isn't a plain row list."""
    rows, i, n = [], 0, len(body)
    while True:
        while i < n and body[i].isspace():
            i += 1
        if i >= n or body[i] != "(":
            return None
        depth, j = 1, i + 1
        while j < n and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if depth:
            return None
        rows.append(body[i + 1 : j - 1])
        i = j
        while i < n and body[i].isspace():
            i += 1
        if i >= n:
            return rows, i  # type: ignore[return-value]
        if body[i] != ",":
            return rows, i  # type: ignore[return-value]
        i += 1


def _values_end(masked: str, start: int) -> int:
    """End offset of the row-list starting at `start` (after VALUES)."""
    i, n = start, len(masked)
    while True:
        while i < n and masked[i].isspace():
            i += 1
        if i >= n or masked[i] != "(":
            return i
        depth = 1
        i += 1
        while i < n and depth:
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        j = i
        while j < n and masked[j].isspace():
            j += 1
        if j < n and masked[j] == ",":
            # a following '(' continues the row list; anything else (an
            # alias, another relation) ends it
            k = j + 1
            while k < n and masked[k].isspace():
                k += 1
            if k < n and masked[k] == "(":
                i = j + 1
                continue
        return i


def _convert_values_groups(sql: str) -> str:
    """Rewrite every FROM-clause VALUES row list into SELECT..UNION ALL."""
    while True:
        masked = _mask(sql)
        changed = False
        for vm in _VALUES_RE.finditer(masked):
            # must be a table-factor VALUES: preceded (ignoring ws) by
            # FROM, comma, JOIN or '(' — not INSERT INTO ... VALUES
            k = vm.start() - 1
            while k >= 0 and masked[k].isspace():
                k -= 1
            prev_word = re.search(r"(\w+|\S)?$", masked[: k + 1]).group(0) or ""
            if not (
                prev_word == ","
                or prev_word == "("
                or prev_word.upper() in ("FROM", "JOIN", "LATERAL")
            ):
                continue
            end = _values_end(masked, vm.end())
            body = sql[vm.end() : end]
            got = _split_rows(body)
            if not got:
                continue
            rows, _ = got
            selects = " UNION ALL ".join(f"SELECT {r}" for r in rows)
            wrapped = selects if prev_word == "(" else f"({selects})"
            sql = sql[: vm.start()] + wrapped + sql[end:]
            changed = True
            break  # offsets shifted — rescan
        if not changed:
            return sql


def lateralize(sql: str) -> str:
    """The retry transform (see module docstring). Pure text, no session."""
    out = _convert_values_groups(sql)
    masked = _mask(out)
    # add LATERAL to comma-joined / JOINed parenthesized subqueries inside
    # FROM segments only (a comma before a '(SELECT' in a select list is a
    # scalar subquery and must stay untouched)
    spans = []
    for fm in _FROM_RE.finditer(masked):
        depth = 0
        i = fm.end()
        while i < len(masked):
            ch = masked[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0:
                sm = _SEG_END_RE.match(masked, i)
                if sm:
                    break
            i += 1
        spans.append((fm.end(), i))

    def at_relation_level(pos: int) -> bool:
        """pos is inside a FROM segment AND at that segment's own paren
        depth (a comma inside TVF args must stay untouched)."""
        for a, b in spans:
            if a <= pos < b:
                seg = masked[a:pos]
                if seg.count("(") == seg.count(")"):
                    # balanced within the innermost-matching FROM segment
                    return True
        return False

    edits = []
    for m in _COMMA_SUBQ_RE.finditer(masked):
        if at_relation_level(m.start()):
            edits.append((m.start(), m.start() + 1, ", LATERAL "))
    for m in _JOIN_SUBQ_RE.finditer(masked):
        if at_relation_level(m.start()):
            edits.append((m.end(1), m.end(2), " LATERAL "))
    for start, end, rep in sorted(edits, reverse=True):
        out = out[:start] + rep + out[end:]
    return out


# ---------------------------------------------------------------------------
# function chaining: `expr.fn(args)` -> `fn(expr, args)` (reference
# expr_binder method-call syntax, slt/standard/functions/chaining.slt).
# Retry-only like lateralize: chaining SQL never analyzes clean in Spark,
# and a chainized rewrite that is wrong simply fails again, re-raising
# the original error.
# ---------------------------------------------------------------------------
_CHAIN_RE = re.compile(
    # subject: dotted identifier chain OR a masked string literal (\x00 run)
    r"(?<![\w.)\x00])((?:[A-Za-z_]\w*\.)*[A-Za-z_]\w*|\x00+)\s*\.\s*"
    r"([A-Za-z_]\w*)\s*\(",
)
# roots that are namespaces, not chain subjects (qualified builtins
# system.default.fn and namespaced TVFs csv.read/parquet.*)
_NAMESPACE_ROOTS = {"system", "csv", "parquet", "temp"}


def chainize(sql: str) -> str:
    """Rewrite method-call chaining to plain function calls."""
    while True:
        masked = _mask(sql)
        target = None
        for cand in _CHAIN_RE.finditer(masked):
            subject = sql[cand.start(1) : cand.end(1)]
            if not subject.startswith("'"):
                if subject.split(".")[0].lower() in _NAMESPACE_ROOTS:
                    continue
            target = cand
            break
        if target is None:
            return sql
        subject = sql[target.start(1) : target.end(1)]
        callee = target.group(2)
        open_pos = target.end() - 1
        depth, j = 1, open_pos + 1
        while j < len(masked) and depth:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        if depth:
            return sql
        args = sql[open_pos + 1 : j - 1].strip()
        call = f"{callee}({subject}" + (f", {args}" if args else "") + ")"
        sql = sql[: target.start()] + call + sql[j:]


_AS_ALIAS_TAIL_RE = re.compile(r"\bAS\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE)


def dealias(sql: str) -> str:
    """Duplicate select-list aliases with later references — the
    reference resolves a later bare reference to the LAST prior
    definition (reference_alias_in_select.slt: ``SELECT 1 AS a, 2 AS a,
    a + 3`` → 5); Spark raises AMBIGUOUS_LATERAL_COLUMN_ALIAS. Inline
    the last definition's expression into later references. Retry-only:
    callers try this candidate after the original query fails, so an
    unambiguous query never takes this path."""
    from glaredb_spark.functions.unnest_binder import (
        _split_top_commas,
        _top_level_positions,
    )

    head = re.match(r"^\s*SELECT\s+", sql, re.IGNORECASE)
    if not head:
        return sql
    bounds = _top_level_positions(
        sql, re.compile(r"\b(FROM|WHERE|GROUP|ORDER|LIMIT|HAVING)\b", re.IGNORECASE)
    )
    list_end = min(
        (b.start() for b in bounds if b.start() >= head.end()),
        default=len(sql),
    )
    items = _split_top_commas(sql[head.end() : list_end])
    counts: dict[str, int] = {}
    last_expr: dict[str, str] = {}
    new_items = []
    for it in items:
        work = it
        for name, expr in last_expr.items():
            if counts[name] < 2:
                continue
            work = re.sub(
                rf"(?<![\w.`']){re.escape(name)}(?![\w(`'])",
                f"({expr})",
                work,
            )
        m = _AS_ALIAS_TAIL_RE.search(it)
        if m:
            nm = m.group(1)
            counts[nm] = counts.get(nm, 0) + 1
            last_expr[nm] = it[: m.start()].strip()
        new_items.append(work.strip())
    if not any(c >= 2 for c in counts.values()):
        return sql
    return (
        sql[: head.end()] + ", ".join(new_items) + sql[list_end:]
    )


_LATERAL_AGG_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<outer>[A-Za-z_]\w*)"
    r"\s*,\s*LATERAL\s*\(\s*SELECT\s+(?P<inner_sel>.+?)"
    r"(?:\s+FROM\s+(?P<inner_from>[^)]*?))?\s*\)\s*"
    r"(?P<tail>ORDER\s+BY.*)?$",
    re.IGNORECASE | re.DOTALL,
)
_AGG_FN_RE = re.compile(
    r"\b(sum|min|max|avg|count|bool_and|bool_or)\s*\(", re.IGNORECASE
)


def delateralize_aggregate(sql: str, spark=None) -> str:
    """Comma-joined LATERAL subquery whose select list aggregates over
    outer+inner references — the reference evaluates the aggregate per
    outer row (join/lateral_join_aggregate.slt: ``FROM t1, LATERAL
    (SELECT sum(t1.i * t2.i) FROM t1 AS t2)``); Spark's decorrelator
    rejects aggregates mixing outer and local columns. Manual
    decorrelation: cross-join the inner relation and GROUP BY a per-row
    id of the outer table (a FROM-less lateral aggregates over one
    implicit row). Retry-only candidate, like lateralize/chainize."""
    m = _LATERAL_AGG_RE.match(sql.strip().rstrip(";"))
    if not m or spark is None:
        return sql
    if not _AGG_FN_RE.search(m.group("inner_sel")):
        return sql
    outer = m.group("outer")
    try:
        outer_cols = spark.table(outer).columns
    except Exception:  # noqa: BLE001
        return sql
    inner_from = (m.group("inner_from") or "").strip() or "(SELECT 1)"
    inner_sel = m.group("inner_sel").strip()
    # the reference resolves unqualified inner refs to the lateral's own
    # FROM first — qualify them so the flattened cross join stays
    # unambiguous (`sum(t1.i * i)` → `sum(t1.i * t2.i)`)
    fm = re.match(
        r"^([A-Za-z_]\w*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?$",
        inner_from,
        re.IGNORECASE,
    )
    if fm:
        itable, ialias = fm.group(1), fm.group(2) or fm.group(1)
        try:
            icols = {c.lower() for c in spark.table(itable).columns}
        except Exception:  # noqa: BLE001
            icols = set()
        if icols:
            inner_sel = re.sub(
                r"(?<![\w.`])([A-Za-z_]\w*)(?![\w(`])",
                lambda t: f"{ialias}.{t.group(1)}"
                if t.group(1).lower() in icols
                else t.group(1),
                inner_sel,
            )
    sel = m.group("sel").strip()
    collist = ", ".join(f"{outer}.`{c}`" for c in outer_cols)
    if sel == "*":
        sel = f"{collist}, {inner_sel}"
    else:
        return sql  # only the star form appears in the reference surface
    tail = (m.group("tail") or "").strip()
    return (
        f"SELECT {sel} FROM "
        f"(SELECT *, monotonically_increasing_id() AS __rid FROM {outer}) "
        f"AS {outer} CROSS JOIN {inner_from} "
        f"GROUP BY {outer}.__rid, {collist} {tail}"
    )

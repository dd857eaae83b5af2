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
_CREATE_VIEW_COLS_RE = re.compile(
    r"^(\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?VIEW\s+[\w.`]+\s*)"
    r"\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)(\s+AS\s+)(.*)$",
    re.IGNORECASE | re.DOTALL,
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
    whenever the alias list is shorter than the relation's column list;
    same rule for ``CREATE VIEW v(a) AS SELECT ...`` (the reference allows
    at MOST as many view aliases as body columns, Spark demands exactly)."""
    if "(" not in sql:
        return sql
    cv = _CREATE_VIEW_COLS_RE.match(sql)
    if cv:
        given = [a.strip() for a in cv.group(2).split(",")]
        try:
            cols = spark.sql(f"SELECT * FROM ({cv.group(4)})").columns
        except Exception:  # noqa: BLE001
            cols = None
        if cols is not None and len(given) < len(cols):
            padded = given + [f"`{c}`" for c in cols[len(given) :]]
            sql = (
                cv.group(1) + "(" + ", ".join(padded) + ")"
                + cv.group(3) + cv.group(4)
            )
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
    # bare relation names (tables, views, CTEs): `cte1 AS aliased(c3)` —
    # the AS keyword is required here, so scalar casts/exprs never match;
    # CTE names resolve by probing with the statement's own WITH prefix
    for m in reversed(list(_BARE_ALIAS_RE.finditer(masked))):
        name = m.group(1)
        given = [a.strip() for a in m.group(2).split(",")]
        cols = None
        for probe in _probe_candidates(sql, masked, name):
            try:
                cols = spark.sql(probe).columns
                break
            except Exception:  # noqa: BLE001
                continue
        if cols is None or len(given) >= len(cols):
            continue
        padded = given + [f"`{c}`" for c in cols[len(given) :]]
        sql = sql[: m.start(2)] + ", ".join(padded) + sql[m.end(2) :]
        masked = _mask(sql)
    return sql


_BARE_ALIAS_RE = re.compile(
    # `AS <type-ctor>(...)` (CAST targets like MAP(VARCHAR, INT)) must
    # never be read as a column-alias list
    r"(?<![\w)`.])([A-Za-z_]\w*)\s+AS\s+"
    r"(?!SELECT\b|MAP\b|STRUCT\b|ARRAY\b|DECIMAL\b|NUMERIC\b|VARCHAR\b|CHAR\b|INTERVAL\b)"
    r"\w+\s*\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)",
    re.IGNORECASE,
)
_WITH_RE = re.compile(r"\bWITH\b", re.IGNORECASE)
_SELECT_RE = re.compile(r"\bSELECT\b", re.IGNORECASE)


def _probe_candidates(sql: str, masked: str, name: str) -> list[str]:
    """Probe SQLs to resolve a bare relation's columns: the name directly,
    then (when the statement has a WITH clause) the name inside that
    statement's own CTE scope."""
    probes = [f"SELECT * FROM {name}"]
    wm = _WITH_RE.search(masked)
    if wm and masked[: wm.start()].count("(") == masked[: wm.start()].count(")"):
        depth = 0
        for i in range(wm.end(), len(masked)):
            ch = masked[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0:
                sm = _SELECT_RE.match(masked, i)
                if sm:
                    probes.append(
                        sql[wm.start() : i] + f" SELECT * FROM {name}"
                    )
                    break
    return probes


_SCALAR_SUBQ_ITEM_RE = re.compile(r"^\s*\(\s*SELECT\b.*\)\s*$", re.IGNORECASE | re.DOTALL)
_TRAILING_AS_RE = re.compile(r"\bAS\s+(`[^`]+`|\w+)\s*$", re.IGNORECASE)
_BARE_COL_RE = re.compile(r"^\s*(?:[\w`]+\s*\.\s*)*(`[^`]+`|[A-Za-z_]\w*)\s*$")


def propagate_scalar_subquery_aliases(sql: str, spark) -> str:
    """Name a select-list scalar subquery after its inner output column —
    reference behavior (bind_select_list names the subquery column;
    slt/standard/subqueries/scalar/scalar_subquery.slt): ``SELECT
    (SELECT 'x' AS a ...)`` exposes column ``a`` and ``ORDER BY a``
    resolves. Spark names it ``scalarsubquery()``, so the pre-binder
    appends the inner alias (or the inner bare column name) as an outer
    alias when the user gave none."""
    up = sql.upper()
    if "SELECT" not in up or "(" not in sql:
        return sql
    from glaredb_spark.functions.star_binder import (
        _find_select_span,
        _split_top_commas,
    )

    masked = _mask(sql)
    span = _find_select_span(masked)
    # FROM-less statements: treat end-of-string as the list end
    if span is None:
        m = re.search(r"\bSELECT\b(\s+DISTINCT\b)?", masked, re.IGNORECASE)
        if not m or masked[: m.start()].count("(") != masked[: m.start()].count(")"):
            return sql
        tail = re.search(
            r"\b(ORDER\s+BY|LIMIT|UNION|EXCEPT|INTERSECT)\b",
            masked[m.end():],
            re.IGNORECASE,
        )
        end = m.end() + tail.start() if tail else len(sql)
        list_start, list_end = m.end(), end
    else:
        list_start, _, list_end = span[0], span[1], span[2]
    select_list = sql[list_start:list_end]
    items = _split_top_commas(select_list, masked[list_start:list_end])
    changed = False
    new_items = []
    for item in items:
        if _SCALAR_SUBQ_ITEM_RE.match(item):
            inner = item.strip()[1:-1]
            inner_masked = _mask(inner)
            ispan = _find_select_span(inner_masked)
            if ispan is None:
                im = re.match(r"\s*SELECT\b", inner, re.IGNORECASE)
                itail = re.search(
                    r"\b(WHERE|ORDER\s+BY|LIMIT|GROUP\s+BY)\b",
                    inner_masked,
                    re.IGNORECASE,
                )
                iend = itail.start() if itail else len(inner)
                inner_list = inner[im.end():iend] if im else ""
            else:
                inner_list = inner[ispan[0] : ispan[2]]
            inner_items = _split_top_commas(inner_list, _mask(inner_list))
            if len(inner_items) == 1:
                one = inner_items[0].strip()
                am = _TRAILING_AS_RE.search(one)
                name = None
                if am:
                    name = am.group(1).strip("`")
                else:
                    bm = _BARE_COL_RE.match(one)
                    if bm:
                        name = bm.group(1).strip("`")
                if name:
                    new_items.append(f"{item.rstrip()} AS `{name}`")
                    changed = True
                    continue
        new_items.append(item)
    if not changed:
        return sql
    return sql[:list_start] + " " + ", ".join(
        i.strip() for i in new_items
    ) + " " + sql[list_end:]


_PAREN_VALUES_RE = re.compile(r"\(\s*VALUES\b", re.IGNORECASE)
_FROM_LEAD_RE = re.compile(r"(?:\bFROM|\bJOIN|,)\s*$", re.IGNORECASE)
_NEXT_IDENT_RE = re.compile(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", re.IGNORECASE)
_CLAUSE_KWS = {
    "where", "group", "order", "limit", "having", "union", "except",
    "intersect", "on", "join", "inner", "left", "right", "full", "cross",
    "lateral", "values",
}


def name_unaliased_values(sql: str, spark=None) -> str:
    """Unaliased ``(VALUES ...)`` relations get an explicit
    ``AS __vN(col1..colK)`` alias so expression tuples keep the
    reference's positional columnN names (values_aliases.slt: a lateral
    ``(VALUES (a+3, b*2))`` describes as column1/column2). Spark would
    otherwise name expression columns after their text."""
    n = 0
    pos = 0
    while True:
        masked = _mask(sql)
        m = None
        for cand in _PAREN_VALUES_RE.finditer(masked, pos):
            if _FROM_LEAD_RE.search(masked, 0, cand.start()):
                m = cand
                break
        if m is None:
            return sql
        depth, j = 0, m.start()
        while j < len(masked):
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            return sql
        close = j
        nm = _NEXT_IDENT_RE.match(masked, close + 1)
        if nm and nm.group(1).lower() not in _CLAUSE_KWS:
            pos = close + 1  # already aliased
            continue
        # column count = first tuple's top-level commas + 1
        body = masked[m.end() : close]
        tuple_open = body.find("(")
        if tuple_open < 0:
            pos = close + 1
            continue
        depth2, k, ncols = 0, tuple_open, 1
        while k < len(body):
            ch = body[k]
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
                if depth2 == 0:
                    break
            elif ch == "," and depth2 == 1:
                ncols += 1
            k += 1
        cols = ", ".join(f"col{i+1}" for i in range(ncols))
        n += 1
        sql = (
            sql[: close + 1]
            + f" AS __values{n}({cols})"
            + sql[close + 1 :]
        )
        pos = close + 1

"""SELECT-list star macros: ``* EXCLUDE``, ``* REPLACE``, ``COLUMNS('re')``.

Reference surface: the wildcard modifiers bound in
crates/glaredb_core/src/logical/binder/bind_query/select_list/ (EXCLUDE /
REPLACE lists) and the COLUMNS(<regex>) select expression
(slt/standard/select/{exclude_except,replace,columns}.slt,
slt/standard/ident/case_sensitivity_columns.slt).

Spark 4 natively supports ``* EXCEPT (cols)`` — EXCLUDE is a pure keyword
swap. REPLACE and COLUMNS have no Spark form, so this pre-binder expands
them the way the reference's binder does: resolve the star's column list
(here: from Catalyst's *analyzed* plan of a probe query — analysis only,
nothing executes), then emit an explicit select list with replaced
expressions in-place / regex-matched columns, qualified by their source
relation so multi-relation stars stay unambiguous.

Scope (same as the SLT corpus): macros in the select list of the outermost
SELECT. Occurrences inside string literals or comments are never touched;
statements without the keywords return on a fast path with zero overhead.
"""

from __future__ import annotations

import re

from glaredb_spark.functions.arith_binder import _find_literal_spans

_EXCLUDE_RE = re.compile(r"\bEXCLUDE\b(?=\s*\()", re.IGNORECASE)
# a select item of the form [qual.]* [EXCEPT (cols)] [REPLACE (args)]
_STAR_ITEM_RE = re.compile(
    r"^\s*(?:(`[^`]+`|\w+)\s*\.\s*)?\*"
    r"(?:\s+EXCEPT\s*\(([^)]*)\))?"
    r"(?:\s+REPLACE\s*\((.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COLUMNS_RE = re.compile(
    r"^\s*COLUMNS\s*\(\s*'([^']*)'\s*\)\s*$", re.IGNORECASE
)
_REPLACE_ARG_RE = re.compile(
    r"(?s)^(.*?)\s+AS\s+(`[^`]+`|\w+)\s*$", re.IGNORECASE
)


def _mask(sql: str) -> str:
    """Copy of sql with literal/comment spans blanked (same length)."""
    chars = list(sql)
    for a, b in _find_literal_spans(sql):
        for i in range(a, min(b, len(chars))):
            chars[i] = "\x00"
    return "".join(chars)


def _split_top_commas(s: str, masked: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _find_select_span(masked: str) -> tuple[int, int, int] | None:
    """(select_kw_end, list_start, from_kw_start) of the outermost
    SELECT ... FROM, or None."""
    m = re.search(r"\bSELECT\b(\s+DISTINCT\b)?", masked, re.IGNORECASE)
    if not m:
        return None
    # the SELECT must be at paren depth 0
    if masked[: m.start()].count("(") != masked[: m.start()].count(")"):
        return None
    depth = 0
    for fm in re.finditer(r"[()]|\bFROM\b", masked[m.end():], re.IGNORECASE):
        tok = fm.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return (m.end(), m.end(), m.end() + fm.start())
    return None


def _analyzed_attrs(spark, probe_sql: str) -> list[tuple[str, str | None]]:
    """(name, last-qualifier) for each output attribute of the analyzed
    probe (analysis only — no job runs)."""
    from glaredb_spark.functions.table_sql import rewrite_table_functions

    df = spark.sql(rewrite_table_functions(spark, probe_sql))
    out = df._jdf.queryExecution().analyzed().output()
    attrs: list[tuple[str, str | None]] = []
    for i in range(out.size()):
        a = out.apply(i)
        q = a.qualifier()
        qual = q.apply(q.size() - 1) if q.size() else None
        attrs.append((a.name(), qual))
    return attrs


def _qref(name: str, qual: str | None) -> str:
    nm = f"`{name}`"
    return f"`{qual}`.{nm}" if qual else nm


def rewrite_star_macros(sql: str, spark) -> str:
    up = sql.upper()
    if not any(k in up for k in ("EXCLUDE", "EXCEPT", "REPLACE", "COLUMNS")):
        return sql
    masked = _mask(sql)
    # 1) EXCLUDE (...) -> EXCEPT (...) — Spark-native from here on
    out, last = [], 0
    for m in _EXCLUDE_RE.finditer(masked):
        out.append(sql[last : m.start()])
        out.append("EXCEPT")
        last = m.end()
    if out:
        out.append(sql[last:])
        sql = "".join(out)
        masked = _mask(sql)
    # 2) star EXCEPT / REPLACE / COLUMNS need schema-driven expansion
    # (star EXCEPT could stay Spark-native for single-relation FROMs, but
    # the reference's unqualified-EXCLUDE-over-duplicates semantics need
    # the resolved list — one uniform path)
    if not any(
        re.search(p, masked, re.IGNORECASE)
        for p in (r"\bREPLACE\s*\(", r"\bCOLUMNS\s*\(", r"\*\s+EXCEPT\s*\(")
    ):
        return sql
    # recurse into parenthesized sub-relations first (macros in derived
    # tables / CTE bodies), innermost-out so each FROM-tail is local
    depth, start = 0, -1
    i = 0
    while i < len(masked):
        ch = masked[i]
        if ch == "(":
            if depth == 0:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0 and start >= 0:
                inner = sql[start + 1 : i]
                if inner.lstrip()[:6].upper() in ("SELECT", "VALUES") or (
                    inner.lstrip()[:4].upper() == "WITH"
                ):
                    new_inner = rewrite_star_macros(inner, spark)
                    if new_inner != inner:
                        sql = sql[: start + 1] + new_inner + sql[i:]
                        masked = _mask(sql)
                        i = start + 1 + len(new_inner) + 1
                        continue
        i += 1
    span = _find_select_span(masked)
    if span is None:
        return sql
    _, list_start, from_start = span
    select_list = sql[list_start:from_start]
    from_tail = sql[from_start + len("FROM") :]
    items = _split_top_commas(select_list, masked[list_start:from_start])
    changed = False
    new_items: list[str] = []
    for item in items:
        mstar = _STAR_ITEM_RE.match(item)
        mcols = _COLUMNS_RE.match(item)
        if mstar and (mstar.group(2) is not None or mstar.group(3) is not None):
            qual, excl_list, args = mstar.group(1), mstar.group(2), mstar.group(3)
            star_part = f"{qual}.*" if qual else "*"
            attrs = _analyzed_attrs(spark, f"SELECT {star_part} FROM {from_tail}")
            known = {n.lower() for n, _ in attrs}
            if excl_list is not None:
                # unqualified EXCLUDE drops EVERY output column with that
                # name (multi-relation stars included) — Spark's native
                # EXCEPT instead errors on the ambiguous reference, so the
                # exclusion happens here on the resolved list
                # entries may arrive qualified (the SLT dialect layer
                # qualifies t1.* EXCLUDE (b) → EXCEPT (t1.b) for Spark's
                # native form) — the star is already scoped, so only the
                # column name matters here
                excl = {
                    e.strip().split(".")[-1].strip().strip("`").lower()
                    for e in excl_list.split(",")
                    if e.strip()
                }
                for e in excl:
                    if e not in known:
                        raise ValueError(
                            f'Column "{e}" was in EXCLUDE list, but it\'s '
                            "not a column being returned"
                        )
                attrs = [(n, q) for n, q in attrs if n.lower() not in excl]
                if not attrs:
                    raise ValueError(
                        "EXCLUDE list removes every column of the star "
                        "expansion"
                    )
            repl: dict[str, str] = {}
            if args is not None:
                arg_masked = _mask(args)
                for arg in _split_top_commas(args, arg_masked):
                    am = _REPLACE_ARG_RE.match(arg)
                    if not am:
                        raise ValueError(
                            "REPLACE list entries must be "
                            f"'<expr> AS <column>': {arg!r}"
                        )
                    tgt = am.group(2).strip("`")
                    repl[tgt.lower()] = am.group(1).strip()
                remaining = {n.lower() for n, _ in attrs}
                for tgt in repl:
                    if tgt not in remaining:
                        raise ValueError(
                            f'Column "{tgt}" was in REPLACE list, but '
                            "it's not a column being returned"
                        )
            new_items.append(
                ", ".join(
                    f"{repl[n.lower()]} AS `{n}`"
                    if n.lower() in repl
                    else _qref(n, q)
                    for n, q in attrs
                )
            )
            changed = True
        elif mcols:
            pat = re.compile(mcols.group(1))
            attrs = _analyzed_attrs(spark, f"SELECT * FROM {from_tail}")
            picked = [(n, q) for n, q in attrs if pat.search(n)]
            if not picked:
                raise ValueError(
                    f"COLUMNS('{mcols.group(1)}') matched no columns"
                )
            new_items.append(", ".join(_qref(n, q) for n, q in picked))
            changed = True
        else:
            new_items.append(item)
    if not changed:
        return sql
    return (
        sql[:list_start]
        + " "
        + ", ".join(i.strip() for i in new_items)
        + " FROM"
        + from_tail
    )

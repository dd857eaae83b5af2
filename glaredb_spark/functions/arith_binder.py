"""Integer-division + polymorphic-arith pre-binder for the SQL surface.

The reference registers polymorphic ``add/sub/mul/div/rem`` scalar names and
gives ``/`` *integer* semantics when both operands are integers (``5 / 2 =
2``) — see ``crates/glaredb_core/src/functions/scalar/builtin/arith/`` and
its own acceptance file ``slt/standard/functions/scalar/arith.slt``. Spark
SQL has float ``/`` (``5/2 = 2.5``) and no polymorphic SQL UDFs, so a
reference user's integer-division SQL would silently change meaning.

This module rewrites SQL text *before* Spark parses it:

1. ``add(a,b)/sub/mul/div/rem`` calls expand to parenthesized infix forms
   (recursively — ``add(add(1,2), 3)`` works). ``div(a,b)`` expands to
   ``(a / b)`` and then falls into rule 2, matching the reference where
   ``div`` on floats is float division (``div(1.0, 2) = 0.5``) and on ints
   is integer division (``div(5, 2) = 2``).
2. Every ``/`` whose operands are **provably both integral** becomes
   Spark's infix ``div`` (bigint, truncates toward zero — exactly the
   reference's Rust ``i64 /``). Provably means a static scan: integer
   literals, unary sign, parenthesized int expressions, whitelisted
   int-returning functions (count/length/...), CAST targets, and column
   references resolved through a caller-supplied ``resolver`` (catalog
   schemas / VALUES tuples). Anything unresolvable leaves ``/`` untouched
   — conservative: unknown sites keep Spark float semantics rather than
   guessing.

Operand analysis is precedence-aware on the multiplicative level: the left
operand of ``/`` is the whole preceding ``* / % div`` chain (so
``1.0 * 3 / 2`` stays float division), the right operand is the single
following factor (``a / b * c`` only considers ``b``).
"""

from __future__ import annotations

import re
from collections.abc import Callable

# --- literal / token helpers -------------------------------------------

_INT_LIT = re.compile(r"^[+-]?\d+$")
_NUM_LIT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_IDENT = re.compile(r"^[A-Za-z_][\w.]*$")

# Functions whose result is integral iff ALL args are integral.
_INT_IF_ARGS_INT = {"abs", "mod", "negate", "greatest", "least", "coalesce",
                    "nullif", "if", "sum", "min", "max", "gcd", "lcm",
                    "shiftleft", "shiftright", "xor", "power_of_two"}
# Functions that always return an integral type (Spark + reference agree).
_ALWAYS_INT = {"count", "length", "char_length", "character_length", "ascii",
               "strpos", "position", "instr", "levenshtein", "factorial",
               "row_number", "rank", "dense_rank", "ntile", "octet_length",
               "bit_length", "sign"}
_INT_TYPE_NAMES = {"tinyint", "smallint", "int", "integer", "bigint",
                   "long", "short", "byte", "int8", "int16", "int32",
                   "int64"}

Resolver = Callable[[str], "bool | None"]


def _find_literal_spans(sql: str) -> list[tuple[int, int]]:
    """Spans of quoted literals ('…' "…" `…`), line comments (-- …) and
    (nested) block comments (/*…*/), inclusive start / exclusive end, so
    rewrites never touch their insides. Double quotes are string literals
    in Spark's default dialect; block comments contain '/' and must be
    masked before division-site scanning."""
    spans, i, n = [], 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in "'\"`":
            j = i + 1
            while j < n:
                if sql[j] == "\\" and ch != "`":
                    j += 2  # C-style escape (\' \" \\) inside strings
                    continue
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:
                        j += 2  # doubled-quote escape ('' "" ``)
                        continue
                    break
                j += 1
            spans.append((i, j + 1))
            i = j + 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            j = i + 2
            while j < n and sql[j] != "\n":
                j += 1
            spans.append((i, j))
            i = j
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            depth, j = 1, i + 2
            while j < n and depth:
                if sql[j] == "/" and j + 1 < n and sql[j + 1] == "*":
                    depth += 1
                    j += 2
                elif sql[j] == "*" and j + 1 < n and sql[j + 1] == "/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def _in_spans(pos: int, spans: list[tuple[int, int]]) -> bool:
    return any(s <= pos < e for s, e in spans)


def _split_top_args(s: str) -> list[str]:
    args, buf, depth, i, n = [], [], 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"":
            j = i + 1
            while j < n:
                if s[j] == ch:
                    if j + 1 < n and s[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            buf.append(s[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    if buf:
        args.append("".join(buf))
    return [a.strip() for a in args]


# --- polymorphic function expansion ------------------------------------

_POLY_RE = re.compile(r"\b(add|sub|mul|div|rem)\s*\(", re.IGNORECASE)
_POLY_OP = {"add": "+", "sub": "-", "mul": "*", "div": "/", "rem": "%"}


def expand_poly_calls(sql: str) -> str:
    """add(a,b) -> (a + b) etc., innermost-out until fixed point. A
    matched name whose call doesn't have exactly 2 args (user UDF of the
    same name) is skipped — the search continues past it instead of
    abandoning the remaining rewrites."""
    offset = 0
    while True:
        spans = _find_literal_spans(sql)
        m = None
        for cand in _POLY_RE.finditer(sql, offset):
            if not _in_spans(cand.start(), spans):
                m = cand
                break
        if m is None:
            return sql
        # balanced arg span
        depth, j, n = 1, m.end(), len(sql)
        while j < n and depth:
            if sql[j] in "'\"":
                q = sql[j]
                j += 1
                while j < n and sql[j] != q:
                    j += 1
            elif sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[m.end() : j - 1]
        args = _split_top_args(expand_poly_calls(inner))
        if len(args) != 2:
            offset = m.end()
            continue
        op = _POLY_OP[m.group(1).lower()]
        sql = f"{sql[: m.start()]}({args[0]} {op} {args[1]}){sql[j:]}"


# --- int-ness analysis --------------------------------------------------

_CAST_RE = re.compile(r"^cast\s*\((.*)\s+as\s+([A-Za-z_]\w*)", re.IGNORECASE | re.DOTALL)


def _is_int_expr(expr: str, resolver: Resolver | None) -> bool | None:
    """True (provably integral) / False (provably not) / None (unknown)."""
    e = expr.strip()
    while e.startswith("(") and e.endswith(")"):
        # strip only if the parens are balanced around the whole expr
        depth = 0
        for i, ch in enumerate(e):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(e) - 1:
                    break
        else:
            e = e[1:-1].strip()
            continue
        break
    if not e:
        return None
    if _INT_LIT.match(e):
        return True
    if _NUM_LIT.match(e):
        return False
    if e.startswith("'"):
        return False
    if e[0] in "+-":
        return _is_int_expr(e[1:], resolver)
    # binary arith at top level: int iff all terms int
    parts = _split_arith_terms(e)
    if len(parts) > 1:
        verdicts = [_is_int_expr(p, resolver) for p in parts]
        if any(v is False for v in verdicts):
            return False
        if all(v is True for v in verdicts):
            return True
        return None
    cast = _CAST_RE.match(e)
    if cast:
        return cast.group(2).lower() in _INT_TYPE_NAMES
    call = re.match(r"^([A-Za-z_][\w.]*)\s*\((.*)\)$", e, re.DOTALL)
    if call:
        fname = call.group(1).lower()
        if fname in _ALWAYS_INT:
            return True
        if fname in _INT_IF_ARGS_INT:
            verdicts = [
                _is_int_expr(a, resolver)
                for a in _split_top_args(call.group(2))
            ]
            if all(v is True for v in verdicts):
                return True
            if any(v is False for v in verdicts):
                return False
            return None
        return None
    if _IDENT.match(e):
        kw = e.lower()
        if kw in ("null", "true", "false"):
            return False if kw != "null" else None
        if resolver is not None:
            return resolver(e.split(".")[-1])
        return None
    return None


def _split_arith_terms(e: str, ops: list[str] | None = None) -> list[str]:
    """Split a (paren-balanced) expression at top-level + - * / % div ops;
    returns the operand pieces. Binary-minus vs unary-minus: a '-' directly
    after another operator or at the start is unary and stays attached.
    When ``ops`` is given, the operator symbols are appended to it in
    order (used by the decimal classifier to spot division in a chain)."""
    parts, buf, depth, i, n = [], [], 0, 0, len(e)
    prev_operand = False  # saw an operand since last operator
    while i < n:
        ch = e[i]
        if ch in "'\"":
            j = i + 1
            while j < n:
                if e[j] == ch:
                    if j + 1 < n and e[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            buf.append(e[i : j + 1])
            prev_operand = True
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0:
            if ch in "+-" and prev_operand:
                parts.append("".join(buf))
                buf = []
                prev_operand = False
                if ops is not None:
                    ops.append(ch)
                i += 1
                continue
            if ch in "*/%":
                parts.append("".join(buf))
                buf = []
                prev_operand = False
                if ops is not None:
                    ops.append(ch)
                i += 1
                continue
            word = re.match(r"[Dd][Ii][Vv]\b", e[i:])
            if word and not prev_operand_char(e, i) and buf and buf[-1].isspace():
                parts.append("".join(buf))
                buf = []
                prev_operand = False
                if ops is not None:
                    ops.append("div")
                i += 3
                continue
        if not ch.isspace():
            prev_operand = True
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p for p in (p.strip() for p in parts) if p]


def prev_operand_char(e: str, i: int) -> bool:
    """True if e[i:] starting 'div' is part of a longer identifier."""
    before = e[i - 1] if i else ""
    after = e[i + 3] if i + 3 < len(e) else ""
    return (before.isalnum() or before == "_") or (after.isalnum() or after == "_")


# --- the / -> div site rewrite ------------------------------------------

_MULT_OPS = ("*", "/", "%")


def _scan_operand_left(sql: str, pos: int) -> tuple[int, str]:
    """Return (start, text) of the full multiplicative chain ending just
    before `pos` (the '/' character)."""
    i = pos - 1
    # single factor scanner, repeated across * / % div links
    start = pos
    while True:
        while i >= 0 and sql[i].isspace():
            i -= 1
        if i < 0:
            break
        ch = sql[i]
        if ch in ")]":
            depth = 0
            while i >= 0:
                if sql[i] in ")]":
                    depth += 1
                elif sql[i] in "([":
                    depth -= 1
                    if depth == 0:
                        break
                elif sql[i] == "'":
                    i -= 1
                    while i >= 0 and sql[i] != "'":
                        i -= 1
                i -= 1
            # optional function name before the (
            j = i - 1
            while j >= 0 and (sql[j].isalnum() or sql[j] in "_."):
                j -= 1
            i = j
            start = j + 1
        elif ch == "'":
            j = i - 1
            while j >= 0 and sql[j] != "'":
                j -= 1
            start = j
            i = j - 1
        elif ch.isalnum() or ch in "_.`":
            end = i + 1
            j = i
            while j >= 0 and (sql[j].isalnum() or sql[j] in "_.`"):
                j -= 1
            start = j + 1
            # signed-exponent float literal (ADVICE r3): a pure digit run
            # preceded by e+/e- attached to a numeric mantissa is the
            # exponent tail of ONE float factor ('1e-5'), not an int operand
            if (
                sql[start:end].isdigit()
                and start >= 3
                and sql[start - 1] in "+-"
                and sql[start - 2] in "eE"
                and (sql[start - 3].isdigit() or sql[start - 3] == ".")
            ):
                j = start - 3
                while j >= 0 and (sql[j].isalnum() or sql[j] in "_."):
                    j -= 1
                start = j + 1
            i = j
        else:
            break
        # continue left across a multiplicative link?
        k = i
        while k >= 0 and sql[k].isspace():
            k -= 1
        if k >= 0 and sql[k] in _MULT_OPS:
            i = k - 1
            continue
        if k >= 2 and sql[k - 2 : k + 1].lower() == "div" and (
            k - 3 < 0 or not (sql[k - 3].isalnum() or sql[k - 3] == "_")
        ):
            i = k - 3
            continue
        break
    return start, sql[start:pos]


def _scan_operand_right(sql: str, pos: int) -> tuple[int, str]:
    """Return (end, text) of the single factor starting after `pos`."""
    i, n = pos + 1, len(sql)
    while i < n and sql[i].isspace():
        i += 1
    start = i
    if i < n and sql[i] in "+-":
        i += 1
        while i < n and sql[i].isspace():
            i += 1
    if i < n and (sql[i].isalnum() or sql[i] in "_.`"):
        while i < n and (sql[i].isalnum() or sql[i] in "_.`"):
            i += 1
        # exponent part of a float literal like 1e-5
        if i < n and sql[i - 1] in "eE" and sql[i] in "+-" and sql[start].isdigit():
            i += 1
            while i < n and sql[i].isdigit():
                i += 1
        if i < n and sql[i] == ".":
            i += 1
            while i < n and (sql[i].isalnum() or sql[i] in "_."):
                i += 1
        k = i
        while k < n and sql[k].isspace():
            k += 1
        if k < n and sql[k] == "(":  # function call
            depth = 0
            i = k
            while i < n:
                if sql[i] == "'":
                    i += 1
                    while i < n and sql[i] != "'":
                        i += 1
                elif sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                i += 1
    elif i < n and sql[i] == "(":
        depth = 0
        while i < n:
            if sql[i] == "'":
                i += 1
                while i < n and sql[i] != "'":
                    i += 1
            elif sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            i += 1
    elif i < n and sql[i] == "'":
        i += 1
        while i < n and sql[i] != "'":
            i += 1
        i += 1
    return i, sql[start:i]


def rewrite_int_division(sql: str, resolver: Resolver | None = None) -> str:
    """Rewrite every provably-int/int ``/`` site to infix ``div``."""
    out = sql
    # right-to-left so earlier replacements don't shift later positions
    spans = _find_literal_spans(out)
    sites = [
        i
        for i, ch in enumerate(out)
        if ch == "/" and not _in_spans(i, spans)
    ]
    for i in reversed(sites):
        _, left = _scan_operand_left(out, i)
        _, right = _scan_operand_right(out, i)
        if not left.strip() or not right.strip():
            continue
        if (
            _is_int_expr(left, resolver) is True
            and _is_int_expr(right, resolver) is True
        ):
            out = out[:i] + " div " + out[i + 1 :]
    return out


# --- decimal / division -> float64 (reference div.rs) --------------------

# The reference's `/` on decimals casts BOTH sides to float64 and divides
# (functions/scalar/builtin/arith/div.rs:122-135 DivDecimal, "Current
# implementation just casts both side to float64"), so decimal÷decimal is
# Float64-typed and keeps float precision (tpchbench q08 mkt_share:
# 0.018250279107962147). Spark's decimal division stays DECIMAL with a
# bounded result scale, silently losing that precision. The classifier
# below statically types expressions as 'dec' | 'int' | 'no' (provably
# something else) | None (unknown) and rewrites provable decimal `/`
# sites to explicit double division. Unknown sites are left untouched —
# conservative, same policy as the int-division rewrite above.

ClassResolver = Callable[[str], "str | None"]

_DEC_TYPE_WORDS = {"decimal", "numeric", "dec"}
_FLOAT_TYPE_WORDS = {"double", "float", "real", "float4", "float8"}
_CASE_RE = re.compile(r"^case\b.*\bend$", re.IGNORECASE | re.DOTALL)


def _strip_outer_parens(e: str) -> str:
    e = e.strip()
    while e.startswith("(") and e.endswith(")"):
        depth = 0
        for i, ch in enumerate(e):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(e) - 1:
                    return e
        e = e[1:-1].strip()
    return e


def _combine_classes(classes: list["str | None"]) -> "str | None":
    if any(c is None for c in classes):
        return None
    if any(c == "no" for c in classes):
        return "no"
    return "dec" if "dec" in classes else "int"


def _case_branch_exprs(e: str) -> "list[str] | None":
    """THEN/ELSE result expressions of a top-level CASE ... END (nested
    CASEs stay inside their branch text and recurse via _dec_class)."""
    body = e[4:-3]  # strip CASE / END (caller matched _CASE_RE)
    spans = _find_literal_spans(body)
    kw = re.compile(r"\b(case|end|when|then|else)\b", re.IGNORECASE)
    out, nest = [], 0
    collecting_from: "int | None" = None
    events = [
        m for m in kw.finditer(body) if not _in_spans(m.start(), spans)
    ]
    # paren depth must be tracked across the whole body
    depth_at: dict[int, int] = {}
    d = 0
    for i, ch in enumerate(body):
        if _in_spans(i, spans):
            continue
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
        depth_at[i] = d
    for m in events:
        if depth_at.get(m.start(), 0) != 0:
            continue
        word = m.group(1).lower()
        if word == "case":
            nest += 1
            continue
        if word == "end":
            if nest:
                nest -= 1
            continue
        if nest:
            continue
        if collecting_from is not None:
            out.append(body[collecting_from : m.start()].strip())
            collecting_from = None
        if word in ("then", "else"):
            collecting_from = m.end()
    if collecting_from is not None:
        out.append(body[collecting_from:].strip())
    return [x for x in out if x] or None


_COLON_CAST_RE = re.compile(
    r"^(.*)::\s*([A-Za-z_]\w*)\s*(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?\s*$",
    re.DOTALL,
)

# reference returns Float64 for these regardless of input (avg.rs floats
# decimal averages; the SLT describe tolerance documents the same)
_ALWAYS_FLOAT_FNS = {"avg", "mean"}
# forced to DECIMAL(18,3) by misc_binder.rewrite_datepart_decimal
# (date_part.rs:77-79)
_ALWAYS_DEC_FNS = {"extract", "date_part"}


def _cast_target_class(type_word: str) -> "str | None":
    t = type_word.lower()
    if t in _INT_TYPE_NAMES:
        return "int"
    if t in _DEC_TYPE_WORDS:
        return "dec"
    return "no"  # float/text/date/... — provably not decimal or int


def _dec_class(expr: str, resolver: "ClassResolver | None") -> "str | None":
    """'dec' (provably decimal-typed under reference rules), 'int'
    (provably integral), 'no' (provably neither), None (unknown)."""
    e = _strip_outer_parens(expr)
    if not e:
        return None
    if _INT_LIT.match(e):
        return "int"
    if _NUM_LIT.match(e):
        # 1.5 parses as a decimal literal in both engines; an exponent
        # makes it float
        return "no" if ("e" in e or "E" in e) else "dec"
    if e.startswith("'") or e.startswith('"'):
        return "no"
    if e[0] in "+-":
        return _dec_class(e[1:], resolver)
    ops: list[str] = []
    parts = _split_arith_terms(e, ops)
    if len(parts) > 1:
        classes = [_dec_class(p, resolver) for p in parts]
        c = _combine_classes(classes)
        if any(op in ("%", "div") for op in ops):
            # Spark keeps decimal %/div decimal-typed while the
            # reference has no decimal overload (implicit float) — no
            # rewrite matches them yet, so a decimal-involving chain is
            # UNKNOWN (skip downstream rewrites), not provably-float
            return c if c == "int" else None
        if any(op == "/" for op in ops):
            # decimal involved in division → reference result is
            # Float64 (div.rs DivDecimal) — and after this module's
            # own site rewrite Spark agrees
            return "no" if c == "dec" else c
        return c
    if _CASE_RE.match(e):
        branches = _case_branch_exprs(e)
        if branches is None:
            return None
        classes = [
            None if b.lower() == "null" else _dec_class(b, resolver)
            for b in branches
        ]
        # a NULL branch carries no type of its own
        classes = [c for c, b in zip(classes, branches)
                   if b.lower() != "null"] or [None]
        return _combine_classes(classes)
    cast = _CAST_RE.match(e)
    if cast:
        return _cast_target_class(cast.group(2))
    colon = _COLON_CAST_RE.match(e)
    if colon and "::" in e:
        return _cast_target_class(colon.group(2))
    over = re.match(
        r"^(.*\S)\s+OVER\s*(\(.*\)|[A-Za-z_]\w*)\s*$",
        e,
        re.IGNORECASE | re.DOTALL,
    )
    if over:
        # window form: the value type is the function's (tpcds q12:
        # sum(x) OVER (PARTITION BY c))
        return _dec_class(over.group(1), resolver)
    call = re.match(r"^([A-Za-z_][\w.]*)\s*\((.*)\)$", e, re.DOTALL)
    if call:
        fname = call.group(1).lower()
        if fname in _ALWAYS_INT:
            return "int"
        if fname in _ALWAYS_FLOAT_FNS:
            return "no"
        if fname in _ALWAYS_DEC_FNS:
            return "dec"
        if fname in _INT_IF_ARGS_INT:
            args = _split_top_args(call.group(2))
            if fname == "if" and len(args) == 3:
                args = args[1:]  # the boolean condition carries no value type
            elif fname == "nullif" and args:
                args = args[:1]  # result type is the first argument's
            return _combine_classes(
                [_dec_class(a, resolver) for a in args]
            )
        return None
    if _IDENT.match(e):
        kw = e.lower()
        if kw == "null":
            return None
        if kw in ("true", "false"):
            return "no"
        if resolver is not None:
            return resolver(e.split(".")[-1])
        return None
    return None


def _iter_values_tuples(sql: str):
    """Yield each VALUES tuple as its list of top-level literal texts —
    the single scanner both the int-ness and class maps derive from."""
    for m in _VALUES_RE.finditer(sql):
        i, n = m.end(), len(sql)
        while i < n:
            while i < n and (sql[i].isspace() or sql[i] == ","):
                i += 1
            if i >= n or sql[i] != "(":
                break
            depth, j = 0, i
            while j < n:
                if sql[j] == "'":
                    j += 1
                    while j < n and sql[j] != "'":
                        j += 1
                elif sql[j] == "(":
                    depth += 1
                elif sql[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            yield _split_top_args(sql[i + 1 : j])
            i = j + 1


def _values_classmap(sql: str) -> dict[str, "str | None"]:
    """colN / columnN -> type class inferred from VALUES literal tuples."""
    verdict: dict[int, list] = {}
    for tup in _iter_values_tuples(sql):
        for k, lit in enumerate(tup):
            verdict.setdefault(k, []).append(_dec_class(lit, None))
    out: dict[str, "str | None"] = {}
    for k, classes in verdict.items():
        cls = _combine_classes(classes)
        out[f"col{k + 1}"] = cls
        out[f"column{k + 1}"] = cls
    return out


_NOT_A_TABLE = {"values", "unnest", "lateral", "select"}
_RESERVED_AFTER_TABLE = {
    "where", "group", "order", "on", "join", "inner", "left", "right",
    "full", "cross", "limit", "union", "intersect", "except", "having",
    "qualify", "window", "using", "natural", "lateral", "values",
    "select", "offset", "when", "then", "else", "end", "and", "or",
}


def _from_tables(sql: str) -> set[str]:
    """Table names referenced after FROM/JOIN, including comma-separated
    FROM lists (`FROM part, supplier, lineitem l` — TPC-H style)."""
    names: set[str] = set()
    spans = _find_literal_spans(sql)
    n = len(sql)
    for m in re.finditer(r"\b(FROM|JOIN)\b", sql, re.IGNORECASE):
        if _in_spans(m.start(), spans):
            continue
        i = m.end()
        while True:
            while i < n and sql[i].isspace():
                i += 1
            t = re.match(r"[A-Za-z_][\w.]*", sql[i:])
            if not t or t.group(0).lower() in _NOT_A_TABLE:
                break
            names.add(t.group(0))
            i += t.end()
            while i < n and sql[i].isspace():
                i += 1
            a = re.match(r"(?:AS\s+)?([A-Za-z_]\w*)", sql[i:], re.IGNORECASE)
            if a and a.group(1).lower() not in _RESERVED_AFTER_TABLE:
                i += a.end()
                while i < n and sql[i].isspace():
                    i += 1
            if i < n and sql[i] == ",":
                i += 1
                continue
            break
    return names


def make_class_resolver(spark, sql: str) -> ClassResolver:
    """Column type-class resolver ('dec'/'int'/'no'/None): catalog
    schemas of FROM/JOIN tables, VALUES tuples, and SELECT-list aliases
    (classified from their expression text — how subquery-derived names
    like q08's `volume` resolve)."""
    vmap = {k.lower(): v for k, v in _values_classmap(sql).items()}
    table_names = _from_tables(sql)
    colmap: dict[str, "str | None"] = {}
    for t in table_names:
        try:
            schema = spark.table(t).schema
        except Exception:  # noqa: BLE001 — TVFs/missing tables: no info
            continue
        for f in schema.fields:
            name = f.name.lower()
            tn = f.dataType.typeName()
            if tn in ("byte", "short", "integer", "long"):
                cls: "str | None" = "int"
            elif tn.startswith("decimal"):
                cls = "dec"
            else:
                cls = "no"
            if name in colmap and colmap[name] != cls:
                colmap[name] = None
            elif name not in colmap:
                colmap[name] = cls

    def base_resolve(name: str) -> "str | None":
        key = name.lower()
        if key in vmap:
            return vmap[key]
        return colmap.get(key)

    # SELECT-list aliases: `expr AS name` anywhere in the text (subquery
    # nesting doesn't matter — resolution is by name). Conflicting
    # definitions resolve to unknown.
    aliasmap: dict[str, "str | None"] = {}
    spans = _find_literal_spans(sql)
    for m in re.finditer(r"\s+AS\s+([A-Za-z_]\w*)", sql, re.IGNORECASE):
        if _in_spans(m.start(), spans):
            continue
        name = m.group(1).lower()
        i, depth, start = m.start() - 1, 0, 0
        while i >= 0:
            if _in_spans(i, spans):
                i -= 1
                continue
            ch = sql[i]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:
                    start = i + 1
                    break
                depth -= 1
            elif depth == 0 and ch == ",":
                start = i + 1
                break
            i -= 1
        expr = sql[start : m.start()].strip()
        expr = re.sub(
            r"^(?:SELECT\s+)?(?:DISTINCT\s+)?", "", expr, flags=re.IGNORECASE
        )
        if not expr:
            continue
        cls = _dec_class(expr, base_resolve)
        if name in aliasmap and aliasmap[name] != cls:
            aliasmap[name] = None
        elif name not in aliasmap:
            aliasmap[name] = cls

    def resolve(name: str) -> "str | None":
        key = name.lower()
        if key in vmap:
            return vmap[key]
        if key in colmap:
            return colmap[key]
        return aliasmap.get(key)

    return resolve


_AVG_CALL_RE = re.compile(r"\b(avg|mean)\s*\(", re.IGNORECASE)


def _find_close(s: str, open_pos: int) -> int:
    """Index of the ')' matching the '(' at open_pos (quote-aware)."""
    depth, i, n = 0, open_pos, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"":
            q = s[i]
            i += 1
            while i < n and s[i] != q:
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


_NOT_A_WINDOW_NAME = {
    "from", "where", "group", "order", "having", "union", "intersect",
    "except", "limit", "offset", "join", "inner", "left", "right",
    "full", "cross", "on", "as", "and", "or", "when", "then", "else",
    "end", "select", "window", "qualify", "using",
}


def _extend_over(sql: str, end: int) -> int:
    """If an OVER clause follows position ``end``, return the position
    past it (through `OVER (...)` or a named window `OVER w`); else
    ``end`` unchanged. Splitting a window call from its OVER clause
    would produce unparseable SQL. A keyword after OVER is NOT a window
    name (`a / b over FROM t` — 'over' used as a bare column alias)."""
    m = re.match(r"\s+OVER\b\s*", sql[end:], re.IGNORECASE)
    if not m:
        return end
    rest = end + m.end()
    if rest < len(sql) and sql[rest] == "(":
        oc = _find_close(sql, rest)
        return oc + 1 if oc >= 0 else end
    named = re.match(r"[A-Za-z_]\w*", sql[rest:])
    if named and named.group(0).lower() not in _NOT_A_WINDOW_NAME:
        return rest + named.end()
    return end


def rewrite_dec_avg(
    sql: str, resolver: "ClassResolver | None" = None
) -> str:
    """``avg()`` over decimals returns Float64 in the reference
    (avg.rs floats decimal averages; the SLT describe tolerance
    documents it) while Spark keeps DECIMAL(p+4,s+4) — which then
    changes downstream division precision. Wrap every provably-decimal
    avg/mean call in ``CAST(.. AS DOUBLE)``; window forms extend the
    wrap over the OVER clause (a CAST between the call and OVER would
    not parse)."""
    out, pos = sql, 0
    while True:
        spans = _find_literal_spans(out)
        m = next(
            (
                c
                for c in _AVG_CALL_RE.finditer(out, pos)
                if not _in_spans(c.start(), spans)
            ),
            None,
        )
        if m is None:
            return out
        close = _find_close(out, m.end() - 1)
        if close < 0:
            return out
        args = _split_top_args(out[m.end() : close])
        arg = args[0].strip() if len(args) == 1 else ""
        arg = re.sub(r"^(?:DISTINCT|ALL)\s+", "", arg, flags=re.IGNORECASE)
        if not arg or _dec_class(arg, resolver) != "dec":
            pos = m.end()
            continue
        end = _extend_over(out, close + 1)
        call = out[m.start() : end]
        out = f"{out[:m.start()]}CAST({call} AS DOUBLE){out[end:]}"
        pos = m.start() + 5 + len(call) + 11  # past ' AS DOUBLE)'


def rewrite_dec_division(
    sql: str, resolver: "ClassResolver | None" = None
) -> str:
    """Rewrite every provably-decimal ``/`` site to double division
    (reference div.rs:122-135: DivDecimal casts both sides to f64).
    Qualifies when one side is provably decimal and the other provably
    decimal-or-int (the reference implicit-casts the int side)."""
    # each iteration rewrites exactly one site and never creates a new
    # qualifying one (the inserted CASTs classify 'no'), so site-count
    # iterations always suffice — no silent cap on large queries
    guard = 0
    max_iters = sql.count("/") + 8
    while guard < max_iters:
        guard += 1
        spans = _find_literal_spans(sql)
        changed = False
        for i, ch in enumerate(sql):
            if ch != "/" or _in_spans(i, spans):
                continue
            ls, left = _scan_operand_left(sql, i)
            rend, right = _scan_operand_right(sql, i)
            if not left.strip() or not right.strip():
                continue
            # window operands: absorb the OVER clause on the right
            # (CAST between call and OVER would not parse — tpcds q12),
            # and extend a left scan that stopped at the OVER keyword
            new_rend = _extend_over(sql, rend)
            if new_rend != rend:
                rend, right = new_rend, sql[i + 1 : new_rend]
            mo = re.search(r"\bOVER\s*$", sql[:ls], re.IGNORECASE)
            if mo or re.match(r"^OVER\b", left.strip(), re.IGNORECASE):
                anchor = mo.start() if mo else ls
                ls2, _fn = _scan_operand_left(sql, anchor)
                if _fn.strip():
                    ls, left = ls2, sql[ls2:i]
            lc = _dec_class(left, resolver)
            rc = _dec_class(right, resolver)
            if "dec" in (lc, rc) and {lc, rc} <= {"dec", "int"}:
                sql = (
                    sql[:ls]
                    + f"CAST({left.strip()} AS DOUBLE) / "
                    + f"CAST({right.strip()} AS DOUBLE)"
                    + sql[rend:]
                )
                changed = True
                break
        if not changed:
            break
    return sql


# --- VALUES tuple column typing ----------------------------------------

_VALUES_RE = re.compile(r"\bVALUES\b", re.IGNORECASE)


def values_colmap(sql: str) -> dict[str, bool]:
    """colN / columnN -> int-ness inferred from VALUES literal tuples
    (int only when every tuple's literal in that position is an integer)."""
    verdict: dict[int, bool] = {}
    for tup in _iter_values_tuples(sql):
        for k, lit in enumerate(tup):
            is_int = bool(_INT_LIT.match(lit.strip()))
            verdict[k] = verdict.get(k, True) and is_int
    out: dict[str, bool] = {}
    for k, v in verdict.items():
        out[f"col{k + 1}"] = v
        out[f"column{k + 1}"] = v
    return out


def make_resolver(spark, sql: str) -> Resolver:
    """Column int-ness resolver: VALUES tuples in the query + schemas of
    every catalog table/view named after FROM/JOIN. Ambiguous names (same
    column, different int-ness across tables) resolve to unknown."""
    vmap = {k.lower(): v for k, v in values_colmap(sql).items()}
    table_names = _from_tables(sql)
    colmap: dict[str, bool | None] = {}
    for t in table_names:
        try:
            schema = spark.table(t).schema
        except Exception:  # noqa: BLE001 — TVFs/missing tables: no info
            continue
        for f in schema.fields:
            name = f.name.lower()
            is_int = f.dataType.typeName() in (
                "byte", "short", "integer", "long",
            )
            if name in colmap and colmap[name] != is_int:
                colmap[name] = None
            else:
                colmap[name] = is_int

    def resolve(name: str) -> bool | None:
        key = name.lower()
        if key in vmap:
            return vmap[key]
        return colmap.get(key)

    return resolve


_NEEDS_REWRITE = re.compile(
    r"/|\b(add|sub|mul|div|rem)\s*\(", re.IGNORECASE
)


def rewrite_arith(sql: str, spark=None) -> str:
    """Full pre-binder pass: polymorphic call expansion + int `/` -> div.
    No-ops (and costs one regex) when the query has no `/` or poly call."""
    if not _NEEDS_REWRITE.search(sql):
        return sql
    sql = expand_poly_calls(sql)
    resolver = make_resolver(spark, sql) if spark is not None else None
    sql = rewrite_int_division(sql, resolver)
    spans = _find_literal_spans(sql)
    has_div = any(
        ch == "/" and not _in_spans(i, spans) for i, ch in enumerate(sql)
    )  # literal-masked gate: paths/URLs alone don't pay resolver cost
    has_avg = bool(_AVG_CALL_RE.search(sql))
    if has_div or has_avg:
        cres = make_class_resolver(spark, sql) if spark is not None else None
        if has_avg:
            sql = rewrite_dec_avg(sql, cres)
        if has_div:
            sql = rewrite_dec_division(sql, cres)
    return sql

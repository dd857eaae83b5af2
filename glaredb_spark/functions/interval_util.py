"""Reference INTERVAL surface on Spark.

The reference's Interval is a single (months, days, nanos) value
(crates/glaredb_core/src/arrays/datatype.rs Interval;
slt/standard/cast/interval.slt) displayed Postgres-style
(``200 years 4 mons 08:02:01``). Spark splits intervals into
YearMonthIntervalType / DayTimeIntervalType and cannot even parse a
mixed-unit literal (``INTERVAL '2 years 8 hours'`` is a parse error),
while PySpark cannot collect YearMonthIntervalType at all.

Mapping (SURVEY.md §1.3):
- pure day-time values → DayTimeIntervalType (collected as timedelta);
- pure year-month values → YearMonthIntervalType (SLT runner casts to
  months and renders Postgres-style);
- mixed-unit *literals* → the Postgres-formatted display string (no
  Spark value type exists; documented display fallback);
- ``INTERVAL <expr> <unit>`` with a column reference (the reference
  allows non-literal quantities) → ``make_dt_interval`` /
  ``make_ym_interval``.
"""

from __future__ import annotations

import re

__all__ = [
    "parse_interval_text",
    "pg_format_interval",
    "rewrite_intervals",
]

_UNIT_MONTHS = {
    "millennium": 12000, "millenniums": 12000, "millennia": 12000,
    "century": 1200, "centuries": 1200,
    "decade": 120, "decades": 120,
    "year": 12, "years": 12, "yr": 12, "yrs": 12, "y": 12,
    "month": 1, "months": 1, "mon": 1, "mons": 1,
}
_UNIT_MICROS = {
    "week": 7 * 86_400_000_000, "weeks": 7 * 86_400_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000, "d": 86_400_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000, "h": 3_600_000_000,
    "hr": 3_600_000_000, "hrs": 3_600_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "min": 60_000_000, "mins": 60_000_000,
    "second": 1_000_000, "seconds": 1_000_000,
    "sec": 1_000_000, "secs": 1_000_000, "s": 1_000_000,
    "millisecond": 1_000, "milliseconds": 1_000, "ms": 1_000,
    "microsecond": 1, "microseconds": 1, "us": 1,
}
_TOKEN_RE = re.compile(r"([+-]?\d+(?:\.\d+)?)\s*([a-zA-Z]+)")
_TIME_RE = re.compile(r"([+-]?)(\d+):(\d+)(?::(\d+(?:\.\d+)?))?")


def parse_interval_text(s: str) -> tuple[int, int] | None:
    """'2 centuries 4 months 8 hours' → (months, micros); None if the
    text isn't an interval spec. Days fold into micros (the reference
    displays day and sub-day parts together). A bare number is seconds
    (Postgres)."""
    s = s.strip()
    if not s:
        return None
    if re.fullmatch(r"[+-]?\d+(?:\.\d+)?", s):
        return 0, int(float(s) * 1_000_000)
    months, micros = 0, 0
    rest = s
    tm = _TIME_RE.search(rest)
    if tm:
        sign = -1 if tm.group(1) == "-" else 1
        t = (
            int(tm.group(2)) * 3_600_000_000
            + int(tm.group(3)) * 60_000_000
            + int(float(tm.group(4) or 0) * 1_000_000)
        )
        micros += sign * t
        rest = rest[: tm.start()] + rest[tm.end() :]
    matched_len = 0
    for m in _TOKEN_RE.finditer(rest):
        qty, unit = float(m.group(1)), m.group(2).lower()
        if unit in _UNIT_MONTHS:
            months += int(qty) * _UNIT_MONTHS[unit]
        elif unit in _UNIT_MICROS:
            micros += int(qty * _UNIT_MICROS[unit])
        else:
            return None
        matched_len += len(m.group(0))
    if not matched_len and not tm:
        return None
    leftovers = _TOKEN_RE.sub("", rest).strip()
    if leftovers and not re.fullmatch(r"[\s,]*", leftovers):
        return None
    return months, micros


def pg_format_interval(months: int, micros: int) -> str:
    """Postgres-style display: '200 years 4 mons 08:02:01', '1 mon',
    '2 days', '00:00:01', '01:00:05.289'."""
    parts = []
    years, mons = int(months) // 12, int(months) % 12
    if months < 0 and mons:
        # Python floor-division differs from Postgres trunc-toward-zero
        years, mons = -((-months) // 12), -((-months) % 12)
    if years:
        parts.append(f"{years} year" + ("s" if abs(years) != 1 else ""))
    if mons:
        parts.append(f"{mons} mon" + ("s" if abs(mons) != 1 else ""))
    days, rem = divmod(abs(int(micros)), 86_400_000_000)
    sign = "-" if micros < 0 else ""
    if days:
        parts.append(f"{sign}{days} day" + ("s" if days != 1 else ""))
    if rem or not parts:
        h, rem2 = divmod(rem, 3_600_000_000)
        m, rem3 = divmod(rem2, 60_000_000)
        sec, us = divmod(rem3, 1_000_000)
        t = f"{sign}{h:02d}:{m:02d}:{sec:02d}"
        if us:
            t += f".{us:06d}".rstrip("0")
        parts.append(t)
    return " ".join(parts)


# --- SQL rewrites ------------------------------------------------------------

# INTERVAL '...' with no trailing unit keyword (Spark single-unit typed
# literals keep their native path)
_INTERVAL_LIT_RE = re.compile(
    r"\bINTERVAL\s+'([^']*)'(?!\s*(?:YEAR|MONTH|DAY|HOUR|MINUTE|SECOND|TO)\b)",
    re.IGNORECASE,
)
_DT_UNITS_SQL = {
    "day": "make_dt_interval({q}, 0, 0, 0)",
    "days": "make_dt_interval({q}, 0, 0, 0)",
    "hour": "make_dt_interval(0, {q}, 0, 0)",
    "hours": "make_dt_interval(0, {q}, 0, 0)",
    "minute": "make_dt_interval(0, 0, {q}, 0)",
    "minutes": "make_dt_interval(0, 0, {q}, 0)",
    "min": "make_dt_interval(0, 0, {q}, 0)",
    "mins": "make_dt_interval(0, 0, {q}, 0)",
    "second": "make_dt_interval(0, 0, 0, {q})",
    "seconds": "make_dt_interval(0, 0, 0, {q})",
    "week": "make_dt_interval(7 * ({q}), 0, 0, 0)",
    "weeks": "make_dt_interval(7 * ({q}), 0, 0, 0)",
    "year": "make_ym_interval({q}, 0)",
    "years": "make_ym_interval({q}, 0)",
    "month": "make_ym_interval(0, {q})",
    "months": "make_ym_interval(0, {q})",
}
# INTERVAL <ident-or-number> <unit> — non-string quantity (column refs
# and unquoted numbers; the reference binds arbitrary expressions)
_INTERVAL_EXPR_RE = re.compile(
    r"\bINTERVAL\s+([A-Za-z_]\w*|[+-]?\d+)\s+"
    r"(day|days|hour|hours|minute|minutes|min|mins|second|seconds|week"
    r"|weeks|year|years|month|months)\b",
    re.IGNORECASE,
)


def _canonical_interval_literal(text: str) -> str | None:
    """Replacement SQL for INTERVAL '<text>' under the reference's
    single-interval model, or None to leave untouched."""
    parsed = parse_interval_text(text)
    if parsed is None:
        return None
    months, micros = parsed
    if months and micros:
        # mixed: no Spark interval type exists — documented display string
        return f"'{pg_format_interval(months, micros)}'"
    if months:
        return f"INTERVAL '{months}' MONTH"
    days, rem = divmod(abs(micros), 86_400_000_000)
    h, rem2 = divmod(rem, 3_600_000_000)
    m, rem3 = divmod(rem2, 60_000_000)
    sec, us = divmod(rem3, 1_000_000)
    sign = "-" if micros < 0 else ""
    frac = f".{us:06d}" if us else ""
    return (
        f"INTERVAL '{sign}{days} {h:02d}:{m:02d}:{sec:02d}{frac}' "
        f"DAY TO SECOND"
    )


def rewrite_intervals(sql: str) -> str:
    """Normalize reference interval forms Spark cannot parse. Applied
    only when the multi-unit literal or non-literal-quantity forms
    appear; Spark-native interval literals pass through untouched."""

    def _lit(m: re.Match) -> str:
        text = m.group(1)
        # leave Spark-parseable single-unit literals alone ('1 day')
        toks = _TOKEN_RE.findall(text)
        bare_number = re.fullmatch(r"[+-]?\d+(?:\.\d+)?", text.strip())
        if len(toks) <= 1 and not bare_number:
            return m.group(0)
        repl = _canonical_interval_literal(text)
        return repl if repl is not None else m.group(0)

    sql = _INTERVAL_LIT_RE.sub(_lit, sql)

    def _expr(m: re.Match) -> str:
        q, unit = m.group(1), m.group(2).lower()
        if re.fullmatch(r"[+-]?\d+", q):
            # numeric quantity: Spark parses these natively
            return m.group(0)
        return _DT_UNITS_SQL[unit].format(q=q)

    return _INTERVAL_EXPR_RE.sub(_expr, sql)

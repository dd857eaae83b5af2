"""SQL-callable table functions — ``SELECT * FROM read_parquet('x')``.

Reference users call scan functions directly in SQL
(glaredb_ext_parquet/src/extension.rs:32-40 registers read_parquet /
parquet_scan; functions/table/builtin/series.rs:20-45 generate_series;
glob.rs, read_text.rs, csv extension.rs:22-31). Spark SQL has no Python
table-function hook, so this pre-binder runs before ``spark.sql``: each
table-function call with a literal argument is materialized as a temp view
(named by content hash — idempotent, shared across repeated calls) and the
call site is rewritten to the view name. The scan itself stays lazy; the
rewrite is metadata-only.

Scanning is string-literal-aware: occurrences inside '...' literals (with
'' escapes) are left untouched. Only literal arguments are supported —
matching the reference, whose table functions also take constant arguments
(table function binding is planning-time in both engines).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import SparkSession

from glaredb_spark.sources import files as _files

_TF = re.compile(
    r"\b(read_parquet|parquet_scan|read_csv|csv_scan|read_text|glob|"
    r"parquet_file_metadata|parquet_rowgroup_metadata|parquet_column_metadata)"
    r"\s*\(\s*'([^']*)'\s*\)",
    re.IGNORECASE,
)
_GS = re.compile(
    r"\bgenerate_series\s*\(\s*(-?\d+)\s*,\s*(-?\d+)\s*(?:,\s*(-?\d+)\s*)?\)",
    re.IGNORECASE,
)

_DISPATCH = {
    "read_parquet": _files.read_parquet,
    "parquet_scan": _files.read_parquet,
    "read_csv": _files.read_csv,
    "csv_scan": _files.read_csv,
    "read_text": _files.read_text,
    "glob": _files.glob_files,
    "parquet_file_metadata": _files.parquet_file_metadata,
    "parquet_rowgroup_metadata": _files.parquet_rowgroup_metadata,
    "parquet_column_metadata": _files.parquet_column_metadata,
}


def _literal_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of single-quoted literals, honoring '' escapes."""
    spans, i, n = [], 0, len(sql)
    while i < n:
        if sql[i] == "'":
            start = i
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
            spans.append((start, min(i + 1, n)))
        i += 1
    return spans


def _view_name(kind: str, arg: str) -> str:
    return "_tf_" + hashlib.md5(f"{kind}:{arg}".encode()).hexdigest()[:12]


def rewrite_table_functions(spark: SparkSession, sql: str) -> str:
    """Materialize table-function calls as temp views and rewrite the SQL to
    reference them. Returns the rewritten statement."""
    for pattern, handler in ((_TF, _handle_tf), (_GS, _handle_gs)):
        spans = _literal_spans(sql)

        def outside(pos: int) -> bool:
            return not any(s <= pos < e for s, e in spans)

        out, last = [], 0
        for m in pattern.finditer(sql):
            if not outside(m.start()):
                continue
            view = handler(spark, m)
            out.append(sql[last : m.start()])
            out.append(view)
            last = m.end()
        out.append(sql[last:])
        sql = "".join(out)
    return sql


def _handle_tf(spark: SparkSession, m: re.Match) -> str:
    fn, arg = m.group(1).lower(), m.group(2)
    view = _view_name(fn, arg)
    _DISPATCH[fn](spark, arg).createOrReplaceTempView(view)
    return view


def _handle_gs(spark: SparkSession, m: re.Match) -> str:
    start, stop = int(m.group(1)), int(m.group(2))
    step = int(m.group(3)) if m.group(3) else 1
    view = _view_name("generate_series", f"{start},{stop},{step}")
    _files.generate_series(spark, start, stop, step).createOrReplaceTempView(view)
    return view

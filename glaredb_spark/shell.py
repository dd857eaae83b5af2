"""Interactive SQL shell — the Spark analog of GlareDB's CLI
(crates/glaredb/src/main.rs:18-31: interactive shell, -c commands, -f files).

Usage:
    python -m glaredb_spark.shell                 # interactive REPL
    python -m glaredb_spark.shell -c "SELECT 1"   # one-shot command
    python -m glaredb_spark.shell -f script.sql   # run a SQL file
    python -m glaredb_spark.shell --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import sys


def _split_sql(text: str) -> list[str]:
    """Split a script on ';' statement terminators, quote-aware: semicolons
    inside single-quoted literals (with '' escapes) or double-quoted
    identifiers don't split (ADVICE r1)."""
    stmts: list[str] = []
    buf: list[str] = []
    quote: str | None = None  # "'" or '"' while inside a literal/identifier
    i = 0
    while i < len(text):
        ch = text[i]
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                if quote == "'" and i + 1 < len(text) and text[i + 1] == "'":
                    buf.append("'")  # '' escape stays inside the literal
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    if "".join(buf).strip():
        stmts.append("".join(buf))
    return stmts


def _run_sql(sess, sql: str) -> None:
    sql = sql.strip().rstrip(";")
    if not sql:
        return
    try:
        sess.sql(sql).show(50, truncate=False)
    except Exception as e:  # show the error, keep the shell alive
        print(f"error: {e}", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="glaredb_spark.shell")
    ap.add_argument("-c", "--command", help="run a single SQL command and exit")
    ap.add_argument("-f", "--file", help="run semicolon-separated SQL from a file")
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="fixture dir to register as tables (e.g. /root/testdata/sf0.01)",
    )
    args = ap.parse_args(argv)

    from glaredb_spark import connect

    sess = connect(app_name="glaredb_spark_shell", sf_dir=args.sf_dir)
    try:
        if args.command:
            _run_sql(sess, args.command)
            return 0
        if args.file:
            with open(args.file) as fh:
                for stmt in _split_sql(fh.read()):
                    _run_sql(sess, stmt)
            return 0
        print("glaredb_spark shell — SQL statements end with ';', \\q quits")
        buf: list[str] = []
        while True:
            try:
                line = input("... " if buf else "sql> ")
            except (EOFError, KeyboardInterrupt):
                break
            if line.strip() in {"\\q", "exit", "quit"}:
                break
            buf.append(line)
            if line.rstrip().endswith(";"):
                _run_sql(sess, " ".join(buf))
                buf = []
        return 0
    finally:
        sess.close()


if __name__ == "__main__":
    raise SystemExit(main())

"""External Postgres reads — ``read_postgres`` TVF + ATTACH POSTGRES.

Reference surface (slt/postgres/{read_postgres,attach}.slt): a
``read_postgres(conn, schema, table)`` table function and
``ATTACH POSTGRES DATABASE AS name (connection_string '...')`` making
``name.<schema>.<table>`` resolvable in FROM. Both ride the
from-scratch wire client (sources/pgwire.py) — no driver library or
jar needed.

Scale note: this path fetches through the driver (the reference is
single-node and does the same). On a cluster with the postgres JDBC
jar, ``spark.read.jdbc(partitionColumn=...)`` is the executor-parallel
path; this client is the jar-less fallback and the metadata/attach
surface.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from glaredb_spark.sources.pgwire import connect, spark_type

# session-keyed ATTACHed postgres databases: {alias: conninfo-string}
_ATTACHED: dict[str, str] = {}


def _q(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def read_postgres(
    spark: SparkSession, conn: str, schema: str, table: str
) -> DataFrame:
    c = connect(conn)
    try:
        cols, rows = c.query(f"SELECT * FROM {_q(schema)}.{_q(table)}")
    finally:
        c.close()
    ddl = ", ".join(f"`{col.name}` {spark_type(col.type_oid)}" for col in cols)
    return spark.createDataFrame([tuple(r) for r in rows], ddl)


def attach_postgres(alias: str, conninfo: str) -> None:
    _ATTACHED[alias.lower()] = conninfo


def detach_postgres(alias: str) -> bool:
    return _ATTACHED.pop(alias.lower(), None) is not None


def attached() -> dict[str, str]:
    return dict(_ATTACHED)


def resolve_attached_tables(spark: SparkSession, sql: str) -> str:
    """Rewrite ``alias.schema.table`` references for every ATTACHed
    postgres database into materialized temp views (planning-time table
    resolution, like the reference's external-database binder)."""
    import re

    for alias, conn in _ATTACHED.items():
        pat = re.compile(
            rf"\b{re.escape(alias)}\s*\.\s*(\w+)\s*\.\s*(\w+)",
            re.IGNORECASE,
        )

        def repl(m: re.Match) -> str:
            schema, table = m.group(1), m.group(2)
            view = "_pg_" + hashlib.md5(
                f"{conn}:{schema}:{table}".encode()
            ).hexdigest()[:12]
            read_postgres(spark, conn, schema, table).createOrReplaceTempView(
                view
            )
            return view

        sql = pat.sub(repl, sql)
    return sql

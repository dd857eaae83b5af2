"""Catalog & DDL surface — the Spark analog of GlareDB's memory catalog.

Reference: session DatabaseContext with `system` + `temp` catalogs
(catalog/context.rs:14-15,25-42), DDL operators CreateTable/CreateTableAs/
CreateSchema/CreateView/Insert/Drop (execution/operators/catalog/*.rs),
catalog introspection table functions (functions/table/builtin/list_*.rs),
and DESCRIBE output (statement Describe, glaredb_parser statement.rs:24-62).

Spark mapping: temp views play the `temp` catalog; `spark.catalog` plays the
introspection surface; `saveAsTable`/`INSERT INTO` play the DML operators.
``describe`` renders Spark types with the reference's type names
(Int64/Utf8/Decimal64(p,s)/…) so DESCRIBE-golden tests can compare.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


# Reference schema model: the temp catalog ships schemas default /
# information_schema / pg_catalog / temp (catalog/context.rs:25-42);
# CREATE SCHEMA adds to that set. Spark has a flat database namespace, so
# created schemas map to databases and the reference's base set is virtual.
_BASE_SCHEMAS = frozenset({"default", "information_schema", "pg_catalog", "temp"})
_SCHEMAS: dict[str, set[str]] = {}


def _created_schemas(spark: SparkSession) -> set[str]:
    return _SCHEMAS.setdefault(spark.sparkContext.applicationId, set())


def create_schema(spark: SparkSession, name: str) -> None:
    """CREATE SCHEMA [catalog.]name — the catalog qualifier (temp.s1) is
    dropped: Spark's database namespace is flat."""
    short = name.split(".")[-1]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{short}`")
    _created_schemas(spark).add(short)


def drop_schema(spark: SparkSession, name: str, cascade: bool = False) -> None:
    short = name.split(".")[-1]
    spark.sql(f"DROP DATABASE IF EXISTS `{short}`" + (" CASCADE" if cascade else ""))
    _created_schemas(spark).discard(short)


def list_schemas_ref(spark: SparkSession) -> list[str]:
    """SHOW SCHEMAS with the reference's base set (show_schemas.slt)."""
    return sorted(_BASE_SCHEMAS | _created_schemas(spark))


def reset_schemas(spark: SparkSession) -> None:
    """Drop every schema created through create_schema and clear tracking —
    the SLT runner calls this per file (the reference runs each file in a
    fresh engine)."""
    for s in list(_created_schemas(spark)):
        spark.sql(f"DROP DATABASE IF EXISTS `{s}` CASCADE")
    _created_schemas(spark).clear()


# ---------------------------------------------------------------------------
# ATTACH / DETACH database (reference declares + stubs: engine/session.rs:390
# `not_implemented!("Attach database")`; behavioral spec in
# slt/standard/attach/memory.slt — duplicate-attach and missing-detach are
# errors, with the messages mirrored below).
#
# Spark mapping: an attached catalog = a Spark database. `ATTACH MEMORY` is
# an empty database (managed tables live in the warehouse); attaching a
# directory path registers every parquet/csv file in it as an EXTERNAL
# table (USING <fmt> LOCATION ...) — zero copy, dropped metadata-only on
# detach. Attachment state is tracked per SparkSession so the reference's
# error semantics hold even though Spark's CREATE DATABASE is idempotent.
# ---------------------------------------------------------------------------

_ATTACHED: dict[str, set[str]] = {}
_IDENT = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


def _attached(spark: SparkSession) -> set[str]:
    key = spark.sparkContext.applicationId
    return _ATTACHED.setdefault(key, set())


def attach_database(
    spark: SparkSession, alias: str, path: str | None = None
) -> None:
    """ATTACH [MEMORY] DATABASE AS alias — optionally backed by a directory
    of parquet/csv files, each registered as an external table
    ``alias.<stem>``."""
    if not _IDENT.match(alias):
        raise ValueError(f"invalid database alias: {alias!r}")
    if alias in _attached(spark) or spark.catalog.databaseExists(alias):
        raise ValueError(f"Catalog with name '{alias}' already attached")
    spark.sql(f"CREATE DATABASE `{alias}`")
    try:
        if path is not None:
            if not os.path.isdir(path):
                raise ValueError(f"ATTACH path is not a directory: {path!r}")
            for fname in sorted(os.listdir(path)):
                stem, ext = os.path.splitext(fname)
                fmt = ext.lstrip(".").lower()
                if fmt not in ("parquet", "csv") or not _IDENT.match(stem):
                    continue
                loc = os.path.join(path, fname).replace("'", "''")
                opts = (
                    " OPTIONS (header 'true', inferSchema 'true')"
                    if fmt == "csv"
                    else ""
                )
                spark.sql(
                    f"CREATE TABLE `{alias}`.`{stem}` USING {fmt}"
                    f"{opts} LOCATION '{loc}'"
                )
    except BaseException:
        spark.sql(f"DROP DATABASE IF EXISTS `{alias}` CASCADE")
        raise
    _attached(spark).add(alias)


def detach_database(spark: SparkSession, alias: str) -> None:
    """DETACH DATABASE alias — drops the database; external table data is
    untouched (metadata-only, like the reference's catalog detach)."""
    if alias not in _attached(spark):
        raise ValueError(f"Database with name '{alias}' doesn't exist")
    spark.sql(f"DROP DATABASE IF EXISTS `{alias}` CASCADE")
    _attached(spark).discard(alias)


def list_attached(spark: SparkSession) -> list[str]:
    return sorted(_attached(spark))


def create_view(spark: SparkSession, name: str, sql_text: str) -> None:
    """CREATE TEMP VIEW storing SQL text (reference stores view SQL —
    bind_create_view.rs)."""
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql_text}")


def create_table_as(df: DataFrame, name: str) -> None:
    """CTAS into the session catalog (reference create_table_as.rs:56)."""
    df.write.mode("overwrite").saveAsTable(name)


def insert_into(df: DataFrame, name: str) -> None:
    df.write.mode("append").insertInto(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def drop_view(spark: SparkSession, name: str) -> None:
    spark.catalog.dropTempView(name)


def list_tables(spark: SparkSession) -> list[str]:
    return [t.name for t in spark.catalog.listTables()]


def list_schemas(spark: SparkSession) -> list[str]:
    return [d.name for d in spark.catalog.listDatabases()]


def list_functions(spark: SparkSession) -> list[str]:
    return [f.name for f in spark.catalog.listFunctions()]


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None
) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS — the Spark analog of the
    reference's table statistics (HLL NDV + cardinality propagation,
    statistics/{hll,value}.rs, optimizer/join_reorder/statistics.rs:11).
    The reference estimates stats on the fly per query; Spark persists
    them in the catalog for the CBO (`spark.sql.cbo.enabled`) — compute
    once at load, amortized over every subsequent query. Column-level
    stats add NDV/min/max/null-count, which is what join reordering and
    broadcast decisions feed on."""
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
    else:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")


def table_stats(spark: SparkSession, name: str) -> dict[str, str]:
    """Catalog statistics for a managed table (sizeInBytes/rowCount) —
    introspection analog of the reference's stats surface."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    out: dict[str, str] = {}
    for r in rows:
        if r["col_name"] == "Statistics":
            out["statistics"] = r["data_type"]
    return out


# ---------------------------------------------------------------------------
# DESCRIBE with reference type names (SURVEY.md §7 step 4)
# ---------------------------------------------------------------------------

def _ref_type_name(dt: T.DataType) -> str:
    if isinstance(dt, T.ByteType):
        return "Int8"
    if isinstance(dt, T.ShortType):
        return "Int16"
    if isinstance(dt, T.IntegerType):
        return "Int32"
    if isinstance(dt, T.LongType):
        return "Int64"
    if isinstance(dt, T.FloatType):
        return "Float32"
    if isinstance(dt, T.DoubleType):
        return "Float64"
    if isinstance(dt, T.DecimalType):
        kind = "Decimal64" if dt.precision <= 18 else "Decimal128"
        return f"{kind}({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "Utf8"
    if isinstance(dt, T.BinaryType):
        return "Binary"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "Timestamp(µs)"
    if isinstance(dt, T.DateType):
        return "Date32"
    if isinstance(dt, T.BooleanType):
        return "Boolean"
    if isinstance(dt, T.NullType):
        return "Null"
    if isinstance(dt, T.ArrayType):
        return f"List[{_ref_type_name(dt.elementType)}]"  # list_value.slt display
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name} {_ref_type_name(f.dataType)}" for f in dt.fields)
        return f"Struct({inner})"
    return dt.simpleString()


def _display_name(name: str) -> str:
    """Reference column-name display: unaliased literals are '?column?',
    unaliased calls show the bare function name (describe_query.slt —
    `select 1` -> ?column?, `select min(1)` -> min). Spark auto-names
    them '1' / 'min(1)'; plain identifiers pass through."""
    if name == "" or _re.match(r"^[A-Za-z_]\w*$", name):
        return name  # empty names render as (empty), like the reference
    if _re.match(r"^CAST\(", name, _re.IGNORECASE) and name.endswith(")"):
        # cast-of-column keeps the column's name, through nested casts
        # (reference_through_cast: CAST(a::INT AS TEXT) -> a); split at the
        # LAST top-level ' AS ' so nested CAST(... AS ...) stays intact
        content, depth, idx = name[5:-1], 0, -1
        for i, c in enumerate(content):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and content[i : i + 4] == " AS ":
                idx = i
        if idx >= 0:
            return _display_name(content[:idx].strip())
    m = _re.match(r"^([A-Za-z_]\w*)\s*\(", name)
    if m:
        return m.group(1)
    if _re.fullmatch(r"-?\d+(\.\d+)?([eE]-?\d+)?", name) or _re.match(
        r"^[('\[-]", name
    ):
        # Spark auto-generated literal/expression names ('1', '(a + b)',
        # "'x'") — the reference shows ?column? for these
        return "?column?"
    # anything else is a user-quoted alias (`30 days`, tpcds q50) — keep it
    return name


def describe(df: DataFrame, raw_names: bool = False) -> DataFrame:
    """(column_name, datatype) rows with reference-style type strings.

    ``raw_names=True`` (table/file scans) keeps column names verbatim —
    a csv header literally named '4' must not be rewritten; the
    ?column?/function-name display mapping only applies to DESCRIBE
    <query>, where non-identifier names are Spark auto-generated."""
    spark = df.sparkSession
    name = (lambda n: n) if raw_names else _display_name
    rows = [
        (name(f.name), _ref_type_name(f.dataType)) for f in df.schema.fields
    ]
    return spark.createDataFrame(rows, "column_name string, datatype string")

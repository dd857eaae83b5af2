"""File sources — Spark-side equivalents of GlareDB's scan table functions.

Reference surface (SURVEY.md §2.2):
- ``read_parquet`` / ``parquet_scan``  — glaredb_ext_parquet/src/extension.rs:32-40
- ``read_csv`` / ``csv_scan``          — glaredb_ext_csv/src/extension.rs:22-31
- ``read_text``                         — functions/table/builtin/read_text.rs:29
- ``glob(pattern)``                     — functions/table/builtin/glob.rs
- ``generate_series(start, stop, step)``— functions/table/builtin/series.rs:20-45
- ``parquet_file_metadata`` / ``parquet_rowgroup_metadata`` /
  ``parquet_column_metadata``           — glaredb_ext_parquet/src/extension.rs:27-30

Scale notes: all readers return lazy DataFrames; Spark's DataSource handles
split planning (row-group-per-task, like the reference's row-group work queue
at glaredb_ext_parquet/src/functions/scan.rs:153-179), predicate pushdown and
column pruning. The metadata helpers use pyarrow on the driver — metadata is
O(files), not O(data), and mirrors the reference's footer-only scans.
"""

from __future__ import annotations

import glob as _pyglob
import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glaredb_spark.sources.httpfs import is_http_url, localize
from glaredb_spark.sources.objectstore import ensure_object_store


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as raw
    int64 under ``nanosAsLong``. Footer-only inspection via pyarrow."""
    try:
        import pyarrow.parquet as pq

        first = path
        if os.path.isdir(path):
            members = sorted(_pyglob.glob(os.path.join(path, "*.parquet")))
            if not members:
                return []
            first = members[0]
        schema = pq.read_schema(first)
        out = []
        for field in schema:
            typ = field.type
            if hasattr(typ, "unit") and getattr(typ, "unit", None) == "ns":
                out.append(field.name)
        return out
    except Exception:
        return []


def _ensure_session_conf(spark: SparkSession) -> None:
    """Engine-required dynamic SQL confs — set defensively so queries work
    on sessions we didn't build (e.g. the driver's own SparkSession):
    ns-parquet reading and UTC timestamp semantics."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass


def read_parquet(spark: SparkSession, path: str, **options) -> DataFrame:
    """Parquet scan with ns-timestamp normalization.

    Spark has no nanosecond timestamp (SURVEY.md §1.3); ns columns are read
    as int64 nanos and truncated to microsecond TIMESTAMP_NTZ — the same
    truncation DuckDB and the reference's µs pipeline apply.

    http(s):// URLs are supported via the cached fetch in sources/httpfs.py
    (reference: glaredb_http filesystem + slt/http/read_parquet_http.slt).
    """
    _ensure_session_conf(spark)
    path = ensure_object_store(spark, localize(path))
    df = spark.read.options(**options).parquet(path)
    dtypes = dict(df.dtypes)
    for col in _ns_timestamp_columns(path):
        # pyarrow reports INT96 timestamps as ns too, but Spark reads those
        # as TIMESTAMP directly (nanosAsLong only covers annotated NANOS) —
        # normalize only when the column actually surfaced as raw int64
        if dtypes.get(col) == "bigint":
            # integer division — double division would lose precision on
            # ~1e18 ns epoch values (double mantissa is 53 bits)
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz"),
            )
    return df


_CSV_DELIMS = (",", ";", "\t", "|")


def _head_lines(path: str) -> list[str]:
    probe = path
    if os.path.isdir(probe):
        members = sorted(
            p for p in _pyglob.glob(os.path.join(probe, "*")) if os.path.isfile(p)
        )
        probe = members[0] if members else probe
    elif _pyglob.has_magic(probe):
        hits = sorted(_pyglob.glob(probe))
        probe = hits[0] if hits else probe
    if not os.path.isfile(probe):
        return []
    try:
        with open(probe, "rb") as fh:
            head = fh.read(8192).decode("utf-8", errors="replace")
    except OSError:
        return []
    return [ln for ln in head.splitlines() if ln.strip()][:10]


def _sniff_delimiter(path: str) -> str | None:
    """Detect the field delimiter from the first lines of the file —
    the reference's dialect detection (glaredb_ext_csv/src/dialect.rs
    tries candidate dialects and keeps the one yielding a consistent
    column count > 1). Driver-side, first 8 KB only, local files only."""
    lines = _head_lines(path)
    if not lines:
        return None
    best, best_count = None, 0
    for d in _CSV_DELIMS:
        counts = {ln.count(d) for ln in lines}
        if len(counts) == 1:
            (c,) = counts
            if c > best_count:
                best, best_count = d, c
    return best


def _field_type(s: str) -> int:
    """0=bool, 1=int, 2=float, 3=utf8 (restrictiveness order, schema.rs
    CandidateType)."""
    s = s.strip().strip('"')
    if not s:
        return 0  # empty/null fits anything
    if s.lower() in ("true", "false"):
        return 0
    try:
        int(s)
        return 1
    except ValueError:
        pass
    try:
        float(s)
        return 2
    except ValueError:
        return 3


def _sniff_header(lines: list[str], delim: str) -> bool:
    """Header detection mirroring schema.rs infer_from_records: infer the
    most-restrictive candidate type per column from rows 2..N, then the
    first row is a header iff ANY of its fields is invalid for its
    column's candidate type (a Utf8 column never flags one)."""
    if not lines:
        return True
    first = lines[0].split(delim)
    if len(lines) == 1:
        # no data rows to infer from — text-only first line reads as header
        return all(_field_type(f) == 3 or not f.strip() for f in first)
    ncols = len(first)
    candidates = [0] * ncols
    for ln in lines[1:]:
        for j, f in enumerate(ln.split(delim)[:ncols]):
            candidates[j] = max(candidates[j], _field_type(f))
    # empty fields restrict nothing in DATA rows (null) but are invalid as
    # typed-column values in the header check (schema.rs: `,,` is a header
    # of empty names over typed columns)
    return any(
        (3 if not f.strip().strip('"') else _field_type(f)) > candidates[j]
        for j, f in enumerate(first)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool | None = None,
    infer_schema: bool = True,
    **options,
) -> DataFrame:
    """CSV scan with dialect/schema inference, matching the reference's
    auto-detecting csv reader (glaredb_ext_csv/src/{schema,dialect}.rs):
    when no ``sep`` is given the delimiter is sniffed from the file head
    (comma/semicolon/tab/pipe — consistent count across lines wins), and
    when ``header`` is None it is sniffed too (a header row never contains
    numeric fields). Headerless columns are named col1..colN (Spark VALUES
    convention). Standard-CSV quote doubling ("" inside quoted fields) by
    default — Spark's default escape is backslash."""
    options.setdefault("escape", '"')
    # the reference trims whitespace around unquoted fields before type
    # inference (' 1 ' is an Int64) — mirror with Spark's trim options
    options.setdefault("ignoreLeadingWhiteSpace", "true")
    options.setdefault("ignoreTrailingWhiteSpace", "true")
    resolved = ensure_object_store(spark, localize(path))
    # strip only a LEADING scheme (a path may legally contain 'file:' as a
    # substring elsewhere)
    local = resolved.removeprefix("file://").removeprefix("file:")
    lines = _head_lines(local)
    if "sep" not in options and "delimiter" not in options:
        sniffed = _sniff_delimiter(local)
        if sniffed and sniffed != ",":
            options["sep"] = sniffed
    if header is None:
        header = _sniff_header(lines, options.get("sep", options.get("delimiter", ",")))
    df = spark.read.csv(
        resolved,
        header=header,
        inferSchema=infer_schema,
        **options,
    )
    if not header and all(c.startswith("_c") for c in df.columns):
        df = df.toDF(*[f"col{i + 1}" for i in range(len(df.columns))])
    return df


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """One row per file: (filename, content) — read_text.rs:29 semantics."""
    df = spark.read.format("binaryFile").load(
        ensure_object_store(spark, localize(path))
    )
    return df.select(
        F.col("path").alias("filename"),
        F.decode(F.col("content"), "UTF-8").alias("content"),
    )


def glob_files(spark: SparkSession, pattern: str) -> DataFrame:
    """List files matching a glob pattern (functions/table/builtin/glob.rs).

    Scheme dispatch: plain local paths list via the local filesystem;
    http(s) URLs resolve exact paths only (HEAD-style probe — the reference
    HTTP filesystem cannot list either); any other scheme (s3a://, gs://,
    hdfs://, file://) goes through Hadoop's FileSystem.globStatus, which
    scales the listing and works wherever the connector jars + credentials
    are configured. Listing is metadata-scale; the returned DataFrame is
    distributed.
    """
    schema = T.StructType([T.StructField("filename", T.StringType(), False)])
    if is_http_url(pattern):
        import urllib.request

        if any(c in pattern for c in "*?[{"):
            raise ValueError(
                "HTTP filesystems do not support glob patterns "
                "(exact URLs only, matching the reference glaredb_http)"
            )
        req = urllib.request.Request(pattern, method="HEAD")
        try:
            with urllib.request.urlopen(req):
                hits = [pattern]
        except Exception:
            hits = []
        return spark.createDataFrame([(p,) for p in hits], schema)
    if _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", pattern):
        pattern = ensure_object_store(spark, pattern)
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(pattern)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        statuses = fs.globStatus(jpath)
        hits = sorted(s.getPath().toString() for s in statuses) if statuses else []
        return spark.createDataFrame([(p,) for p in hits], schema)
    rows = [(p,) for p in sorted(_pyglob.glob(pattern, recursive=True))]
    return spark.createDataFrame(rows, schema)


def generate_series(
    spark: SparkSession, start: int, stop: int, step: int = 1
) -> DataFrame:
    """Inclusive-stop integer series (series.rs:20-45,84: inclusive bounds,
    negative steps allowed). ``spark.range`` is exclusive-stop, so widen by
    one step — fully parallel, no data materialized on the driver."""
    if step == 0:
        raise ValueError("generate_series step must not be zero")
    end = stop + (1 if step > 0 else -1)
    return spark.range(start, end, step).select(
        F.col("id").alias("generate_series")
    )


def load_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load fixture tables as DataFrames keyed by table name."""
    from glaredb_spark.session import TPCH_TABLES

    use = names or TPCH_TABLES
    return {
        n: read_parquet(spark, os.path.join(sf_dir, f"{n}.parquet"))
        for n in use
        if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))
    }


def widen_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a narrow scan across the cluster before compute-heavy per-row
    work (vector kernels, shingle hashing, regex pipelines).

    A scan that arrives in fewer splits than cores (one small parquet file
    → one partition) would run its whole map stage on one task. At real
    scale this helper is a NO-OP — a large table already arrives in
    thousands of splits and the partition check skips the exchange — so it
    only fires when the shuffled bytes are by construction tiny.
    """
    spark = df.sparkSession
    want = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def load_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_tables`` + ``widen_partitions`` for compute-heavy corpora
    (documents text pipelines, embedding vector kernels)."""
    return widen_partitions(load_tables(spark, sf_dir, name)[name])


# ---------------------------------------------------------------------------
# Parquet metadata table functions (footer-only, driver-side pyarrow)
# ---------------------------------------------------------------------------

def _expand(path_or_pattern: str) -> list[str]:
    if is_http_url(path_or_pattern):
        return [localize(path_or_pattern)]
    if os.path.isdir(path_or_pattern):
        return sorted(_pyglob.glob(os.path.join(path_or_pattern, "*.parquet")))
    hits = sorted(_pyglob.glob(path_or_pattern))
    return hits or [path_or_pattern]


def parquet_file_metadata(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for p in _expand(path):
        md = pq.read_metadata(p)
        rows.append((p, md.num_rows, md.num_row_groups, md.num_columns,
                     md.format_version, md.created_by))
    schema = T.StructType([
        T.StructField("filename", T.StringType()),
        T.StructField("num_rows", T.LongType()),
        T.StructField("num_row_groups", T.LongType()),
        T.StructField("num_columns", T.LongType()),
        T.StructField("format_version", T.StringType()),
        T.StructField("created_by", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def parquet_rowgroup_metadata(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for p in _expand(path):
        md = pq.read_metadata(p)
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            rows.append((p, i, rg.num_rows, rg.total_byte_size))
    schema = T.StructType([
        T.StructField("filename", T.StringType()),
        T.StructField("row_group", T.LongType()),
        T.StructField("num_rows", T.LongType()),
        T.StructField("total_byte_size", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema)


def parquet_column_metadata(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for p in _expand(path):
        md = pq.read_metadata(p)
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for c in range(rg.num_columns):
                col = rg.column(c)
                stats = col.statistics
                rows.append((
                    p, i, ".".join(col.path_in_schema.split(".")),
                    str(col.physical_type), col.num_values,
                    col.total_compressed_size, col.total_uncompressed_size,
                    str(stats.min) if stats and stats.has_min_max else None,
                    str(stats.max) if stats and stats.has_min_max else None,
                    stats.null_count if stats else None,
                ))
    schema = T.StructType([
        T.StructField("filename", T.StringType()),
        T.StructField("row_group", T.LongType()),
        T.StructField("column", T.StringType()),
        T.StructField("physical_type", T.StringType()),
        T.StructField("num_values", T.LongType()),
        T.StructField("total_compressed_size", T.LongType()),
        T.StructField("total_uncompressed_size", T.LongType()),
        T.StructField("stats_min", T.StringType()),
        T.StructField("stats_max", T.StringType()),
        T.StructField("stats_null_count", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema)

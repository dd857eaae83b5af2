from glaredb_spark.sources.files import (
    generate_series,
    glob_files,
    load_tables,
    parquet_column_metadata,
    parquet_file_metadata,
    parquet_rowgroup_metadata,
    read_csv,
    read_parquet,
    read_text,
)
from glaredb_spark.sources.lakehouse import (
    delta_available,
    iceberg_available,
    read_delta,
    read_iceberg,
)

__all__ = [
    "delta_available",
    "generate_series",
    "glob_files",
    "iceberg_available",
    "load_tables",
    "parquet_column_metadata",
    "parquet_file_metadata",
    "parquet_rowgroup_metadata",
    "read_csv",
    "read_delta",
    "read_iceberg",
    "read_parquet",
    "read_text",
]

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

__all__ = [
    "generate_series",
    "glob_files",
    "load_tables",
    "parquet_column_metadata",
    "parquet_file_metadata",
    "parquet_rowgroup_metadata",
    "read_csv",
    "read_parquet",
    "read_text",
]

"""Batch and streaming sources/sinks with explicit schemas."""

from amazon_books_review_spark.sources.io import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_parquet,
    read_stream_parquet,
    write_parquet,
    write_stream,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_parquet",
    "read_stream_parquet",
    "write_parquet",
    "write_stream",
]

"""Streaming medallion pipeline — MA re-expressed on OSS Spark.

The reference (Amazon_books_review_medallion_architecture.py, MA) runs
four concurrent streaming queries on Databricks: two Auto Loader
bronze ingests (MA:9-44, MA:50-83), a stream-stream silver join
(MA:99-132) and a complete-mode gold aggregate (MA:153-183), all onto
Delta tables.  This module reproduces that dataflow portably:

- Auto Loader        -> OSS parquet file streams with explicit schemas
                        (sources/io.read_stream_parquet)
- Delta sinks        -> checkpointed parquet dirs; complete-mode gold
                        via foreachBatch overwrite (the OSS file sink
                        is append-only)
- 4 concurrent cells -> one orchestrator; with availableNow triggers
                        the stages drain deterministically in
                        dependency order (bronze -> silver -> gold),
                        which is also the test oracle for
                        stream-batch equivalence.

Modes:
- ``fidelity=True``  — the reference's exact semantics: unwatermarked
  stream-stream inner join (unbounded state, MA:116-121) and
  complete-mode gold (full rewrite each batch, MA:182).  Safe only at
  test scale; kept because matching the reference IS the spec.
- ``fidelity=False`` — the 100 TB design: silver as a STREAM-STATIC
  join (book details is a dimension, not an event stream — joining it
  as a stream forces Spark to hold every detail row in state store
  forever; as a static side it is just a broadcast per micro-batch),
  the pushdown-friendly range predicate, and gold in UPDATE mode with
  a key-upsert sink — each micro-batch writes only the changed
  aggregate rows (complete mode rewrites the full table every batch).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from amazon_books_review_spark.plans.books_pipeline import (
    gold_users_count,
    silver_books_reviews,
)
from amazon_books_review_spark.sources.io import (
    default_stream_format,
    read_stream_files,
    read_table_format,
    write_stream,
    write_stream_complete,
    write_stream_update_upsert,
)


@dataclass
class MedallionPaths:
    """All I/O locations for one medallion run, rooted at ``root``."""

    details_in: str
    reviews_in: str
    root: str

    @property
    def details_bronze(self) -> str:
        return os.path.join(self.root, "bronze", "books_details")

    @property
    def reviews_bronze(self) -> str:
        return os.path.join(self.root, "bronze", "books_reviews")

    @property
    def silver(self) -> str:
        return os.path.join(self.root, "silver", "amazon_books_reviews")

    @property
    def gold(self) -> str:
        return os.path.join(self.root, "gold", "books_users_count")

    def checkpoint(self, layer: str) -> str:
        return os.path.join(self.root, "_checkpoints", layer)


def run_streaming_medallion(
    spark: SparkSession,
    paths: MedallionPaths,
    fidelity: bool = True,
    max_files_per_trigger: int | None = None,
    fmt: str | None = None,
    salts: int | None = None,
) -> dict[str, DataFrame]:
    """Drain the full medallion with availableNow triggers.

    Stages run in dependency order, each draining completely before
    the next starts — deterministic, resumable (every sink is
    checkpointed; re-running with the same paths processes only new
    files, exactly like the reference's incremental Auto Loader runs).

    ``fmt`` picks the bronze/silver/gold table format; the default is
    delta when ``delta-spark`` is importable (the reference's actual
    sink format, MA:34-39) and parquet otherwise.  Gold semantics are
    identical across formats — the pytest gate runs both when delta
    is present.

    ``salts`` (VERDICT r7 #8) runs the silver join skew-hardened: the
    reference pipeline's hot-``Title`` key (SURVEY §4.2 #3) scatters
    over that many sub-keys — in the fidelity stream-stream form this
    spreads the hot title's join STATE across state-store partitions
    (``streaming/queries.STREAM_JOIN_SALTS`` documents the sizing
    trade); results are row-identical to unsalted (pytest-pinned).

    Returns the materialized bronze/silver/gold tables as batch
    DataFrames.
    """
    fmt = fmt or default_stream_format()
    # --- bronze: schema comes from a batch peek at the inputs (the
    # OSS file source requires an explicit schema; MA leaned on
    # cloudFiles.schemaLocation for the same thing).  Inputs are the
    # raw parquet drop zone regardless of the table format.
    details_schema = read_table_format(spark, paths.details_in).schema
    reviews_schema = read_table_format(spark, paths.reviews_in).schema

    q1 = write_stream(
        read_stream_files(spark, paths.details_in, details_schema,
                          "parquet", max_files_per_trigger),
        paths.details_bronze,
        paths.checkpoint("details_bronze"),
        fmt=fmt,
        query_name="books_details_bronze",
    )
    q1.awaitTermination()
    q2 = write_stream(
        read_stream_files(spark, paths.reviews_in, reviews_schema,
                          "parquet", max_files_per_trigger),
        paths.reviews_bronze,
        paths.checkpoint("reviews_bronze"),
        fmt=fmt,
        query_name="books_reviews_bronze",
    )
    q2.awaitTermination()

    # --- silver (MA:116-132)
    reviews_stream = read_stream_files(
        spark, paths.reviews_bronze, reviews_schema, fmt, max_files_per_trigger
    )
    if fidelity:
        # Reference shape: BOTH sides streamed, unwatermarked inner
        # join -> unbounded state (MA:116-121).
        details_side: DataFrame = read_stream_files(
            spark, paths.details_bronze, details_schema, fmt,
            max_files_per_trigger,
        )
    else:
        # Scale shape: details is a static dimension side; zero join
        # state, re-snapshotted per micro-batch.
        details_side = read_table_format(spark, paths.details_bronze, fmt)
    silver_df = silver_books_reviews(
        details_side, reviews_stream, fidelity=fidelity, salts=salts
    )
    q3 = write_stream(
        silver_df,
        paths.silver,
        paths.checkpoint("silver"),
        fmt=fmt,
        query_name="amazon_books_reviews_silver",
    )
    q3.awaitTermination()

    # --- gold (MA:153-183).
    silver_schema = read_table_format(spark, paths.silver, fmt).schema
    silver_stream = read_stream_files(
        spark, paths.silver, silver_schema, fmt, max_files_per_trigger
    )
    gold_df = gold_users_count(silver_stream)
    if fidelity:
        # Reference shape: complete mode — the whole gold table is
        # rewritten every micro-batch (MA:182).
        q4 = write_stream_complete(
            gold_df,
            paths.gold,
            paths.checkpoint("gold"),
            fmt=fmt,
            query_name="gold_books_users_count",
        )
    else:
        # Scale shape: update mode + key-upsert — each micro-batch
        # writes only the aggregate rows that changed (O(changed
        # keys) vs complete's O(all keys ever)).
        q4 = write_stream_update_upsert(
            gold_df,
            paths.gold,
            paths.checkpoint("gold"),
            keys=["Title", "Year_of_publish", "categories"],
            query_name="gold_books_users_count",
            fmt=fmt,
        )
    q4.awaitTermination()

    return {
        "bronze_details": read_table_format(spark, paths.details_bronze, fmt),
        "bronze_reviews": read_table_format(spark, paths.reviews_bronze, fmt),
        "silver": read_table_format(spark, paths.silver, fmt),
        "gold": read_table_format(spark, paths.gold, fmt),
    }

"""Sources and sinks: the reference's I/O surface, made portable.

Covers SURVEY.md §2.1:

- S1 CSV batch scan (reference: inferschema at
  Amazon-book-review_books_details.py:54 / _books_reviews.py:29) —
  here with *explicit* schemas, which kills the extra inference pass
  over the file and makes types run-independent.
- S2/S3 Parquet batch sink/scan (BD:203/207, BR:119/125) — with an
  explicit write mode (the reference omits one and fails on re-run).
- S4 Auto Loader replacement: OSS streaming file source with a
  required explicit schema (MA:9-14, MA:50-55).
- S5/S6 checkpointed streaming sinks, append/complete
  (MA:34-39, MA:73-78, MA:127-132, MA:178-183).
- S9 ``dbutils`` mounts (BD:19-34) become plain configurable paths.

Scale notes (100 TB discipline):
- Readers take directories, not single files — a production table is
  thousands of parquet parts; ``spark.read.parquet`` handles both.
- ``write_parquet`` exposes ``partition_by`` and bucketing so big
  fact tables land partitioned (partition pruning at read time) and
  join-heavy tables can be bucketed (shuffle-free co-located joins).
- No ``collect()`` anywhere in this module.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery
from pyspark.sql.types import StructType

#: The driver-provided test tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def delta_available() -> bool:
    """True when ``delta-spark`` is importable.

    The reference's whole medallion persists to Delta (MA:34-39,
    MA:73-78, MA:127-132, MA:178-183); this engine is format-generic
    with parquet as the portable default and delta used end-to-end
    when the package is present.  Sessions must also carry
    :func:`~amazon_books_review_spark.session.delta_session_confs`
    for the SQL extension/catalog to resolve the format.
    """
    import importlib.util

    return importlib.util.find_spec("delta") is not None


def default_stream_format() -> str:
    """The format streaming sinks use when the caller doesn't pin one:
    delta if importable (reference fidelity), else parquet."""
    return "delta" if delta_available() else "parquet"


# ---------------------------------------------------------------------------
# Batch
# ---------------------------------------------------------------------------


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """S1 — CSV scan.  Prefer an explicit ``schema``; inference is a
    full extra pass over the input (SURVEY.md §4.2.5)."""
    reader = spark.read.format("csv").option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3 — Parquet scan (vectorized, column-pruned, filter-pushed by
    Catalyst as long as callers keep predicates on bare columns)."""
    return spark.read.parquet(path)


def read_parquet_evolving(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Parquet scan over a directory whose files were written under
    DIFFERENT schema versions (columns added over time — the normal
    state of a long-lived ingest table).

    Production path: pass the CURRENT contract ``schema`` — old files
    surface NULL for later-added columns, no footer merge needed, and
    the read stays a plain pruned scan.  Discovery path (schema=None):
    ``mergeSchema`` unions all file footers — correct but pays a
    footer read per file at planning time, so at 100 TB it's a tool
    for finding the contract, not for running under it.  (Column
    REMOVALS or type changes are rejected by Spark's merge — handle
    those as explicit migrations, e.g. a compaction rewrite.)
    """
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.option("mergeSchema", True).parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """S2 — Parquet sink with an explicit mode (reference omits it,
    BD:203).  ``partition_by`` enables partition pruning downstream;
    ``max_records_per_file`` bounds file sizes at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_table_format(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Format-generic batch scan: parquet / orc / json / csv.

    JSON and CSV should always get an explicit ``schema`` (inference
    is an extra pass and run-dependent); parquet/orc are self-
    describing.  All four support predicate pushdown except JSON/CSV
    (row formats — at 100 TB convert to a columnar format at ingest,
    which is exactly what the cleaning pipelines do).
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load(path)


def write_table_format(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Format-generic sink (parquet / orc / json / csv), explicit
    mode, optional partitioning.  Delta lands here unchanged when
    ``delta-spark`` is on the classpath (``fmt="delta"``) — the
    engine's sink abstraction is this function's signature."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.save(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted parquet layout.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives each
    output file a disjoint value range on ``sort_cols``, so parquet
    row-group min/max statistics make selective scans skip whole
    files — the poor man's clustering/Z-order, and at 100 TB the
    difference between scanning one file and scanning all of them for
    a point/range query on the sort key.
    """
    out = df.repartitionByRange(
        *([num_files] if num_files else []), *[F.col(c) for c in sort_cols]
    ).sortWithinPartitions(*sort_cols)
    out.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (hash-bucketed by join key, optionally
    sorted within buckets).

    The 100 TB play: two fact tables bucketed on the same key with the
    same bucket count join WITHOUT any Exchange — the shuffle happened
    once at write time and is amortized over every subsequent join.
    Requires table-format writes (``saveAsTable``); plain ``.parquet``
    paths can't carry bucket metadata.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


@lru_cache(maxsize=256)
def table_row_count(sf_dir: str, name: str) -> int:
    """Row count of ``{sf_dir}/{name}.parquet`` from parquet FOOTER
    metadata — no Spark job (VERDICT r18 #4: the self-sizing
    ``df.count()`` inside every ANN catalog entry is an extra
    full-scan action per query; at 100 TB that is a real job, while
    the footer answer is a metadata read).  Handles both a single
    file and a directory of part files (sum of footers).  Cached per
    (sf_dir, name): the driver test tables are immutable fixture
    files — callers pointing this at mutating paths should call
    ``table_row_count.cache_clear()`` between generations."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table: ``{sf_dir}/{name}.parquet``.

    The ``events`` table has shipped ``ts`` in two physical shapes
    across driver testdata generations, both normalized here to plain
    TimestampType (which ``withWatermark`` requires):

    - parquet TIMESTAMP(NANOS): the vectorized reader rejects it;
      under ``spark.sql.legacy.parquet.nanosAsLong=true`` (session.py)
      it arrives as a nanos BIGINT and is converted to TimestampType
      at microsecond precision (``div 1000`` — integer division,
      since nanos exceed double's 2^53 exact-integer range).
    - parquet ``timestamp[us]`` without timezone: Spark reads it as
      TIMESTAMP_NTZ, which the watermark API hard-rejects
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).  Under the pinned UTC
      session a cast to TIMESTAMP reinterprets the wall-clock value
      as UTC — byte-identical instants, watermark-legal type.
    """
    df = read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_event_time(df)


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TimestampType regardless of
    which physical shape the parquet writer used (nanos BIGINT or
    TIMESTAMP_NTZ).  No-op when the column is absent or already
    TimestampType."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load several test tables; optionally register temp views so the
    SQL surface (``spark.sql``) works over them — the reference's
    temp-view+SQL idiom (MA:14, MA:22-25)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------


def read_stream_files(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S4 — the OSS replacement for Databricks Auto Loader (MA:9-14),
    format-generic (parquet / delta / orc / json / csv).

    The OSS *file* sources require a user-supplied schema — which is
    the better engineering anyway (Auto Loader's
    ``cloudFiles.schemaLocation`` exists to paper over inference).
    Delta is self-describing, so ``schema`` is optional there (and
    ignored by the delta source).  ``max_files_per_trigger`` is the
    rate-control knob.
    """
    reader = spark.readStream.format(fmt)
    if schema is not None and fmt != "delta":
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def read_stream_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S4, parquet-pinned form (the common call)."""
    return read_stream_files(
        spark, path, schema, "parquet", max_files_per_trigger
    )


def write_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    fmt: str = "parquet",
    available_now: bool = True,
    query_name: str | None = None,
) -> StreamingQuery:
    """S5/S6 — checkpointed streaming file sink.

    ``available_now=True`` gives deterministic drain-everything-then-stop
    semantics (the test idiom; production would pass False for a
    continuous micro-batch loop).  ``output_mode="complete"`` is only
    valid for aggregations and is handled by :func:`write_stream_complete`
    because the OSS file sink only supports append — the reference's
    complete-mode gold sink (MA:178-183) relies on Delta.
    """
    writer: DataStreamWriter = (
        df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint)
        .option("path", path)
        .outputMode(output_mode)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_update_upsert(
    df: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    available_now: bool = True,
    query_name: str | None = None,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Update-mode aggregate sink via foreachBatch key-upsert.

    The scale-correct alternative to complete mode (SURVEY ST3-ST5):
    with a watermark, update mode emits only the CHANGED aggregate
    rows per micro-batch; this sink merges them into the target by
    key (existing rows for re-emitted keys are replaced).  State and
    per-batch write cost are O(changed keys), not O(all keys ever) —
    complete mode rewrites the full result table every batch, which
    is fatal at 100 TB key cardinalities.

    ``fmt="delta"`` uses a real transactional MERGE INTO
    (whenMatchedUpdateAll / whenNotMatchedInsertAll) — the
    reference's actual gold idiom.  Plain parquet has no MERGE; the
    portable fallback is read -> anti-join on keys -> union ->
    overwrite.  The sink contract is identical either way.
    """

    def _upsert_delta(batch_df: DataFrame, _batch_id: int) -> None:
        from delta.tables import DeltaTable

        spark = batch_df.sparkSession
        if not DeltaTable.isDeltaTable(spark, path):
            batch_df.write.format("delta").mode("overwrite").save(path)
            return
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(batch_df.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def _upsert(batch_df: DataFrame, _batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()
        try:
            existing = spark.read.parquet(path)
            merged = existing.join(
                batch_df.select(*keys), keys, "left_anti"
            ).unionByName(batch_df)
        except AnalysisException as exc:
            # First batch only: the target doesn't exist yet.  Any
            # OTHER failure (transient storage error, corrupt footer)
            # must propagate — falling back here would silently
            # overwrite the table with just this micro-batch and drop
            # every previously upserted key.
            condition = getattr(exc, "getCondition", exc.getErrorClass)() or ""
            if "PATH_NOT_FOUND" not in condition and (
                "Path does not exist" not in str(exc)
            ):
                raise
            merged = batch_df
        merged.localCheckpoint().write.mode("overwrite").parquet(path)

    writer = (
        df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_upsert_delta if fmt == "delta" else _upsert)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_complete(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    query_name: str | None = None,
    fmt: str = "parquet",
) -> StreamingQuery:
    """S6 — complete-mode aggregate sink.

    The OSS parquet sink cannot take ``complete`` output directly
    (that needs a table format with overwrite, i.e. Delta — MA:182).
    Portable equivalent: ``foreachBatch`` overwriting the target per
    micro-batch.  ``fmt="delta"`` writes the same overwrite
    transactionally.  Same observable behavior either way: the sink
    always holds the full current aggregate.
    """

    def _overwrite(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.format(fmt).mode("overwrite").save(path)

    writer = (
        df.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_overwrite)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

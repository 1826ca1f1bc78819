"""Metastore catalog surface — C1-C4 beyond temp views.

The reference persists every medallion layer as a metastore table and
inspects it through the catalog: ``saveAsTable`` at MA:39/78/132/183
(via Delta table names), ``DESCRIBE EXTENDED`` at MA:88/93, and
``spark.table`` reads at MA:99-101/142/153/188.  Round 1 covered
introspection with ``df.schema`` and temp views only; this module adds
the persistent-table idiom on OSS Spark:

- :func:`save_as_table` — managed (or external, with ``path``) table
  through the session catalog; format-generic, so ``fmt="delta"``
  matches the reference exactly when delta-spark is present.
- :func:`read_table` — ``spark.table`` by name.
- :func:`describe_extended` — the raw ``DESCRIBE EXTENDED`` relation.
- :func:`table_details` — the parsed programmatic form (provider,
  location, columns, partitioning) from ``spark.catalog``.

Scale notes: a metastore table is *metadata only* — the data layout
(`partition_by`, bucketing via :func:`io.write_bucketed`) is what
matters at 100 TB.  Managed-table writes go through the normal
DataFrame writer, so everything said in ``sources/io.py`` about
partitioning and file sizing applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_as_table(
    df: DataFrame,
    table: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    path: str | None = None,
    **options: str,
) -> None:
    """Persist ``df`` as a catalog table (MA:39 idiom).

    Managed by default (data lives under ``spark.sql.warehouse.dir``);
    pass ``path`` for an external table.  ``mode="overwrite"`` makes
    re-runs idempotent — the reference's ``.table(...)`` sinks fail on
    re-run without it.

    Stale-location repair: with the default in-memory metastore the
    catalog resets per session while the warehouse directory persists,
    so a managed location can exist with no catalog entry — Spark then
    refuses the create (LOCATION_ALREADY_EXISTS).  For overwrite mode
    the orphaned location is deleted first (via the Hadoop FS API, so
    any storage scheme works).
    """
    spark = df.sparkSession
    if mode == "overwrite" and path is None and not spark.catalog.tableExists(table):
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        name = table.rsplit(".", 1)[-1].lower()
        jvm = spark._jvm
        loc = jvm.org.apache.hadoop.fs.Path(warehouse, name)
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if path is not None:
        writer = writer.option("path", path)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """C1 — read a catalog table by name (MA:99-101 idiom)."""
    return spark.table(table)


def describe_extended(spark: SparkSession, table: str) -> DataFrame:
    """C4 — ``DESCRIBE EXTENDED`` (MA:88): the column section followed
    by the ``# Detailed Table Information`` section (provider,
    location, owner, ...), as Spark's standard 3-column relation."""
    return spark.sql(f"DESCRIBE EXTENDED {table}")


def table_details(spark: SparkSession, table: str) -> dict:
    """The programmatic companion to :func:`describe_extended`:
    everything a caller usually greps the DESCRIBE output for, as a
    plain dict via ``spark.catalog`` (stable API, no string parsing).
    """
    info = spark.catalog.getTable(table)
    columns = spark.catalog.listColumns(table)
    detail_rows = describe_extended(spark, table).collect()
    details = {
        r.col_name: r.data_type
        for r in detail_rows
        if r.col_name and not r.col_name.startswith("#")
    }
    return {
        "name": info.name,
        "database": info.database,
        "table_type": info.tableType,  # MANAGED | EXTERNAL
        "is_temporary": info.isTemporary,
        "columns": {c.name: c.dataType for c in columns},
        "partition_columns": [c.name for c in columns if c.isPartition],
        "bucket_columns": [c.name for c in columns if c.isBucket],
        "provider": details.get("Provider"),
        "location": details.get("Location"),
    }


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop a catalog table if it exists (managed data is deleted —
    that is the metastore contract, same as the reference's Delta
    tables)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# Cost-based-optimizer statistics (ANALYZE TABLE)
# ---------------------------------------------------------------------------


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """``ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]``.

    Feeds the cost-based optimizer: table-level ``sizeInBytes`` /
    ``rowCount`` drive broadcast-side selection and join reordering
    (``spark.sql.cbo.enabled`` + ``joinReorder.enabled``); per-column
    NDV / min / max / null counts sharpen filter-selectivity
    estimates.  At 100 TB this is an operational discipline, not an
    optimization detail — without fresh stats the planner falls back
    to raw file sizes, which overestimate post-filter cardinalities
    and push broadcastable sides into shuffle joins.  Re-run after
    each large ingest (the metadata cost is a scan-light pass; column
    stats add one aggregate over the named columns only).
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, table: str) -> dict:
    """Parsed CBO statistics: ``{"size_bytes": int, "row_count":
    int | None}`` from the DESCRIBE EXTENDED Statistics row, plus
    ``columns``: per-column stats (distinct_count / nulls / min /
    max as strings) for every column that has them."""
    stats: dict = {"size_bytes": None, "row_count": None, "columns": {}}
    for r in describe_extended(spark, table).collect():
        if r.col_name == "Statistics":
            # e.g. "12345 bytes, 678 rows" (rows absent before ANALYZE)
            parts = [p.strip(",") for p in r.data_type.split()]
            if "bytes" in parts:
                stats["size_bytes"] = int(parts[parts.index("bytes") - 1])
            if "rows" in parts:
                stats["row_count"] = int(parts[parts.index("rows") - 1])
    for c in spark.catalog.listColumns(table):
        rows = spark.sql(f"DESCRIBE EXTENDED {table} {c.name}").collect()
        col = {r.info_name: r.info_value for r in rows}
        if col.get("distinct_count", "NULL") != "NULL":
            stats["columns"][c.name] = {
                "distinct_count": col.get("distinct_count"),
                "num_nulls": col.get("num_nulls"),
                "min": col.get("min"),
                "max": col.get("max"),
            }
    return stats

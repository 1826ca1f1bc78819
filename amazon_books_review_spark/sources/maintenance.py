"""Table maintenance: small-file compaction (the OPTIMIZE shape).

A 100 TB table ingested by streaming micro-batches or many small
tasks accumulates thousands of KB-scale files; every subsequent scan
then pays per-file open/footer costs and the driver pays listing and
planning costs (Spark's ``maxPartitionBytes`` packing can coalesce
small files into read tasks, but cannot undo the metadata overhead
or the poor compression of tiny row groups).  Lakehouse engines ship
this as ``OPTIMIZE`` (Delta/Iceberg ``rewrite_data_files``); for
plain parquet directories the same effect is a bin-packed rewrite:
size the output partition count from the INPUT BYTES (a filesystem
listing — no data scan) and rewrite once.

Scale notes: the rewrite is one round-robin exchange (or a range
sort when clustering columns are given — making compaction the
moment zorder/range layout is applied, since the data is being
rewritten anyway, same rationale as ``write_zordered``).  The
listing runs through the Hadoop FileSystem API so it works on any
supported store (local, HDFS, S3A...), not just ``os.walk``-able
paths.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: Default target output file size.  128 MiB matches Spark's default
#: ``files.maxPartitionBytes`` so one post-compaction file == one read
#: task; real deployments tune 128 MiB-1 GiB.
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass(frozen=True)
class FileStats:
    """Listing-derived layout stats for a data directory."""

    n_files: int
    total_bytes: int

    @property
    def avg_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def data_file_stats(spark: SparkSession, path: str, suffix: str = ".parquet") -> FileStats:
    """Count data files and bytes under ``path`` (recursive) via the
    Hadoop FileSystem API — metadata only, no data scan.  Hidden
    files (``_SUCCESS``, ``.crc``) are excluded like Spark's own file
    index does."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n = 0
    total = 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")) or not name.endswith(suffix):
            continue
        n += 1
        total += status.getLen()
    return FileStats(n_files=n, total_bytes=total)


def backfill_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Reprocess a slice of a partitioned table IN PLACE: overwrite
    only the partitions present in ``df``, leaving every other
    partition's files untouched (Spark's dynamic partition overwrite;
    the open-source equivalent of Delta's ``replaceWhere``).

    This is the backfill primitive at 100 TB — recomputing one bad
    day must not rewrite (or even list) the other 3,649 days.  The
    default ``static`` mode would TRUNCATE the whole table first;
    the mode is pinned per-WRITE here (option, not session conf) so
    a concurrent writer on the same session cannot be surprised.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    cluster_by: list[str] | None = None,
) -> FileStats:
    """Bin-pack-rewrite the parquet directory ``src`` into ``dst``
    with output files sized toward ``target_bytes``.

    The output partition count comes from the input LISTING
    (``ceil(input_bytes / target_bytes)``), so the only data pass is
    the rewrite itself.  Compressed input bytes slightly undersize
    the estimate vs in-memory rows, which errs toward fewer, larger
    files — the direction compaction wants.  With ``cluster_by`` the
    rewrite is ``repartitionByRange`` + in-partition sort (data-skipping
    layout applied during the rewrite); without it, a round-robin
    ``repartition`` (pure bin-packing, no key skew possible).

    Returns the OUTPUT :class:`FileStats` so callers can assert the
    compaction actually happened (and audit pipelines can log it).
    """
    stats = data_file_stats(spark, src)
    n_out = max(1, math.ceil(stats.total_bytes / target_bytes))
    df = spark.read.parquet(src)
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(dst)
    return data_file_stats(spark, dst)

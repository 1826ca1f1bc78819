"""Small-file compaction: listing-based sizing, content preservation,
clustered-rewrite layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_books_review_spark.sources import maintenance
from amazon_books_review_spark.sources.io import load_table


def _fragmented_copy(spark, sf_dir, tmp_path, n_files: int) -> str:
    src = str(tmp_path / "fragmented")
    load_table(spark, sf_dir, "documents").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(src)
    return src


def test_file_stats_counts_data_files_only(spark, sf_dir, tmp_path):
    src = _fragmented_copy(spark, sf_dir, tmp_path, 16)
    stats = maintenance.data_file_stats(spark, src)
    # 16 part files; _SUCCESS and .crc siblings must not count
    assert stats.n_files == 16
    assert stats.total_bytes > 0
    assert stats.avg_bytes == stats.total_bytes / 16


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    src = _fragmented_copy(spark, sf_dir, tmp_path, 16)
    dst = str(tmp_path / "compacted")
    before = maintenance.data_file_stats(spark, src)
    # target = all input bytes -> exactly one output file
    out = maintenance.compact_parquet(
        spark, src, dst, target_bytes=before.total_bytes + 1
    )
    assert out.n_files == 1
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == a.count()
    # exact content equality, order-insensitive
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # compaction must not bloat storage disproportionately (tiny files
    # compress worse, so the compacted copy should be no larger)
    assert out.total_bytes <= before.total_bytes


def test_compaction_target_sizing(spark, sf_dir, tmp_path):
    src = _fragmented_copy(spark, sf_dir, tmp_path, 16)
    before = maintenance.data_file_stats(spark, src)
    dst = str(tmp_path / "split")
    # target of half the input -> ceil(total/half) == 2 files (inputs
    # compress the same either way at this scale)
    out = maintenance.compact_parquet(
        spark, src, dst, target_bytes=(before.total_bytes // 2) + 1
    )
    assert out.n_files == 2


def test_clustered_compaction_orders_within_files(spark, sf_dir, tmp_path):
    src = _fragmented_copy(spark, sf_dir, tmp_path, 8)
    dst = str(tmp_path / "clustered")
    maintenance.compact_parquet(
        spark, src, dst, target_bytes=1 << 40, cluster_by=["doc_id"]
    )
    got = spark.read.parquet(dst)
    # single output partition sorted by doc_id: file order == doc order
    ids = [r[0] for r in got.select("doc_id").collect()]
    assert ids == sorted(ids)
    assert got.count() == spark.read.parquet(src).count()

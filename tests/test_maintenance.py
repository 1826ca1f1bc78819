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


def test_backfill_overwrites_only_target_partitions(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite: recomputing one partition must not
    rewrite the others — byte-identical untouched files is the claim."""
    import os

    path = str(tmp_path / "by_lang")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    docs.write.partitionBy("lang").parquet(path)

    def files_by_partition():
        out = {}
        for d in os.listdir(path):
            if not d.startswith("lang="):
                continue
            full = os.path.join(path, d)
            out[d] = {
                f: os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
        return out

    before = files_by_partition()
    langs = sorted(before)
    target = langs[0].split("=", 1)[1]
    # backfill ONE language with doubled n_chars
    patch = docs.filter(F.col("lang") == target).withColumn(
        "n_chars", F.col("n_chars") * 2
    )
    maintenance.backfill_partitions(patch, path, ["lang"])
    after = files_by_partition()
    # untouched partitions: identical file lists AND mtimes
    for d in langs[1:]:
        assert after[d] == before[d], f"{d} was rewritten"
    # target partition: rewritten, and the data reflects the patch
    assert after[langs[0]] != before[langs[0]]
    got = spark.read.parquet(path)
    orig = docs
    assert (
        got.filter(F.col("lang") == target).agg(F.sum("n_chars")).first()[0]
        == orig.filter(F.col("lang") == target)
        .agg(F.sum(F.col("n_chars") * 2))
        .first()[0]
    )
    # row counts preserved everywhere
    assert got.count() == orig.count()


def test_schema_evolution_read(spark, sf_dir, tmp_path):
    """Added-column evolution: v1 files lack `quality`; both the
    explicit-contract read and the mergeSchema discovery read must
    surface v1 rows with NULL quality and v2 rows with values."""
    from amazon_books_review_spark.sources.io import read_parquet_evolving

    path = str(tmp_path / "evolving")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    v1 = docs.filter(F.col("doc_id") % 2 == 0)
    v2 = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "quality", F.col("doc_id").cast("double") / 10
    )
    v1.write.parquet(path + "/batch=1")
    v2.write.parquet(path + "/batch=2")

    contract = "doc_id bigint, lang string, quality double"
    for df in (
        read_parquet_evolving(spark, path, schema=contract),
        read_parquet_evolving(spark, path),  # mergeSchema discovery
    ):
        assert set(df.columns) >= {"doc_id", "lang", "quality"}
        assert df.count() == docs.count()
        nulls = df.filter(F.col("quality").isNull()).count()
        assert nulls == v1.count()
        assert df.filter(F.col("quality").isNotNull()).count() == v2.count()


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

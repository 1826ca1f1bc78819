"""Mechanics tests for the WARC-ish Python Data Source: manifest
commit, stats-based file pruning, overwrite semantics, abort cleanup.

The value-level correctness of the scan is covered by the oracle
parity suite (warcish_roundtrip / warcish_pruned_scan); these tests
assert the parts a value hash can't see — that pruning actually
eliminates files at planning time, and that the writer lifecycle
(commit/abort/overwrite) leaves the directory in the right state.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from amazon_books_review_spark.plans.pyds_queries import _fixture
from amazon_books_review_spark.sources import warcish

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warc_dir(spark):
    return _fixture(spark, SF)


def test_manifest_written_and_consistent(spark, warc_dir):
    manifest = json.load(open(os.path.join(warc_dir, warcish.MANIFEST)))
    files = [n for n in os.listdir(warc_dir) if n.endswith(warcish.DATA_EXT)]
    assert sorted(manifest) == sorted(files), "manifest must list exactly the data files"
    total = sum(m["n_records"] for m in manifest.values())
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == n_docs
    for m in manifest.values():
        if m["n_records"]:
            assert m["min_id"] <= m["max_id"]


def test_range_partitioned_files_have_disjoint_spans(warc_dir):
    """The fixture repartitionByRange gives files disjoint id ranges —
    the property that makes min/max stats selective (mirrors why
    ingest-sorted parquet row groups prune and hash-shuffled ones
    don't)."""
    manifest = json.load(open(os.path.join(warc_dir, warcish.MANIFEST)))
    spans = sorted(
        (m["min_id"], m["max_id"]) for m in manifest.values() if m["n_records"]
    )
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next


def test_push_filters_prune_files_at_planning_time(warc_dir):
    """A narrow doc_id range must survive pushFilters and eliminate
    most container files BEFORE any task launches."""
    reader = warcish.WarcishReader({"path": warc_dir})
    residual = list(
        reader.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 100), LessThan(("doc_id",), 120)]
        )
    )
    assert residual == [], "doc_id range filters must be fully absorbed"
    pruned = reader.partitions()
    total = len(warcish.WarcishReader({"path": warc_dir}).partitions())
    assert len(pruned) < total, "manifest stats must eliminate files"
    # every surviving file's span must overlap [100, 120)
    manifest = json.load(open(os.path.join(warc_dir, warcish.MANIFEST)))
    for p in pruned:
        m = manifest[p.value]
        assert m["max_id"] >= 100 and m["min_id"] <= 119


def test_unsupported_filters_stay_with_spark(warc_dir):
    """Non-doc_id predicates must be yielded back (Spark evaluates
    them post-scan) — absorbing one silently would drop rows."""
    from pyspark.sql.datasource import EqualTo

    reader = warcish.WarcishReader({"path": warc_dir})
    f = EqualTo(("lang",), "en")
    assert list(reader.pushFilters([f])) == [f]


def test_spark_level_pruned_scan_values(spark, warc_dir):
    got = (
        spark.read.format(warcish.FORMAT_NAME)
        .load(warc_dir)
        .filter("doc_id >= 100 and doc_id < 120")
        .select("doc_id")
        .collect()
    )
    exp = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id >= 100 and doc_id < 120")
        .select("doc_id")
        .collect()
    )
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in exp)


def test_overwrite_leaves_no_stale_files(spark, warc_dir):
    """Overwriting with fewer partitions must remove the extra old
    container files and rewrite the manifest to match."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    (
        docs.repartitionByRange(2, "doc_id")
        .write.format(warcish.FORMAT_NAME)
        .mode("overwrite")
        .save(warc_dir)
    )
    try:
        files = [n for n in os.listdir(warc_dir) if n.endswith(warcish.DATA_EXT)]
        manifest = json.load(open(os.path.join(warc_dir, warcish.MANIFEST)))
        assert len(files) == 2
        assert sorted(manifest) == sorted(files)
        assert (
            spark.read.format(warcish.FORMAT_NAME).load(warc_dir).count()
            == docs.count()
        )
    finally:
        # restore the module fixture shape for any later test
        (
            docs.repartitionByRange(8, "doc_id")
            .write.format(warcish.FORMAT_NAME)
            .mode("overwrite")
            .save(warc_dir)
        )


def test_abort_removes_partial_files(tmp_path):
    writer = warcish.WarcishWriter(str(tmp_path), overwrite=False)
    from pyspark.sql import Row

    msg = writer.write(
        iter([Row(doc_id=1, lang="en", source="s", n_chars=2, text="hi")])
    )
    assert os.path.exists(tmp_path / msg.filename)
    writer.abort([msg])
    assert not os.path.exists(tmp_path / msg.filename)


def test_stream_reader_incremental_exactly_once(spark, tmp_path):
    """A second availableNow drain over the SAME checkpoint must pick
    up only files that arrived after the first drain — no reprocessing
    (the offset is a position in the sorted file list)."""
    src = tmp_path / "src"
    src.mkdir()
    warcish.register(spark)

    def put(name: str, doc_id: int):
        # note: uuid writer names always sort AFTER consumed ones here
        # because we control names; production relies on the same
        # append-only contract
        with open(src / name, "w") as fh:
            fh.write(
                f"{warcish.RECORD_MARK}\n"
                f"doc-id: {doc_id}\nlang: en\nsource: s\nlength: 2\n\nhi\n"
            )

    put(f"a{warcish.DATA_EXT}", 1)
    out = tmp_path / "out"

    def drain():
        q = (
            spark.readStream.format(warcish.FORMAT_NAME)
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", str(out / "data"))
            .option("checkpointLocation", str(out / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(str(out / "data")).count() == 1
    put(f"b{warcish.DATA_EXT}", 2)
    drain()
    rows = spark.read.parquet(str(out / "data"))
    assert rows.count() == 2, "second drain must add only the new file"
    assert sorted(r.doc_id for r in rows.collect()) == [1, 2]


def test_newline_payload_rejected(tmp_path):
    writer = warcish.WarcishWriter(str(tmp_path), overwrite=False)
    from pyspark.sql import Row

    with pytest.raises(ValueError, match="single-line"):
        writer.write(
            iter([Row(doc_id=1, lang="en", source="s", n_chars=4, text="a\nb")])
        )

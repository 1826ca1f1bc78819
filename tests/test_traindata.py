"""Unit tests for the training-data hygiene operators
(functions/decontam.py, sampling.shuffled_shard_manifest)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from amazon_books_review_spark.functions import decontam, sampling
from amazon_books_review_spark.sources.io import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


EIGHT = "w1 w2 w3 w4 w5 w6 w7 w8"


class TestDecontam:
    def test_flags_exact_gram_overlap_only(self, spark):
        eval_df = _docs(spark, [(100, f"{EIGHT} tail")])
        train = _docs(
            spark,
            [
                (1, f"prefix {EIGHT} suffix"),   # contains an eval 8-gram
                (2, "a b c d e f g h i j"),       # no overlap
                (3, "w1 w2 w3 w4 w5 w6 w7"),      # 7 words: too short to match
            ],
        )
        grams = decontam.eval_ngram_set(eval_df, "doc_id", "text")
        out = {
            r.doc_id: (r.n_eval_grams_hit, r.contaminated)
            for r in decontam.flag_contaminated(
                train, grams, "doc_id", "text"
            ).collect()
        }
        assert out[1] == (1, 1)
        assert out[2] == (0, 0)
        assert out[3] == (0, 0)
        assert len(out) == 3  # clean docs are returned, not dropped

    def test_counts_distinct_grams(self, spark):
        # eval contributes two distinct grams; train doc contains both.
        eval_df = _docs(spark, [(100, f"{EIGHT} w9")])
        train = _docs(spark, [(1, f"{EIGHT} w9")])
        grams = decontam.eval_ngram_set(eval_df, "doc_id", "text")
        [r] = decontam.flag_contaminated(train, grams, "doc_id", "text").collect()
        assert r.n_eval_grams_hit == 2


class TestShardManifest:
    def test_deterministic_and_complete(self, spark, docs):
        a = sampling.shuffled_shard_manifest(docs, "doc_id", shards=4)
        b = sampling.shuffled_shard_manifest(docs, "doc_id", shards=4)
        rows_a = sorted(a.collect())
        assert rows_a == sorted(b.collect())
        assert len(rows_a) == docs.count()
        assert {r.shard for r in rows_a} <= set(range(4))

    def test_pos_is_contiguous_per_shard(self, spark, docs):
        m = sampling.shuffled_shard_manifest(docs, "doc_id", shards=4).collect()
        by_shard: dict[int, list] = {}
        for r in m:
            by_shard.setdefault(r.shard, []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: r.pos)
            assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
            # pos order must equal shuffle-key order (the export order)
            keys = [(r.shuffle_key, r.doc_id) for r in rows]
            assert keys == sorted(keys)

    def test_salt_gives_independent_permutation(self, spark, docs):
        a = sampling.shuffled_shard_manifest(docs, "doc_id", salt="epoch0")
        b = sampling.shuffled_shard_manifest(docs, "doc_id", salt="epoch1")
        pa = {r.doc_id: (r.shard, r.pos) for r in a.collect()}
        pb = {r.doc_id: (r.shard, r.pos) for r in b.collect()}
        assert pa != pb  # a different epoch reshuffles
        assert set(pa) == set(pb)  # ... without gaining/losing rows

"""Edge-semantics tests for the round-6 LLM-pipeline operators.

The catalog parity suite already value-checks each query against its
DuckDB oracle at corpus scale; these tests pin the EDGE behavior the
oracles can't reach on the synthetic corpus (short docs, zero vectors,
tie-breaks) using tiny in-memory frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from amazon_books_review_spark.plans.llm_queries import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    QUANT_LEVELS,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Chunking edge semantics
# ---------------------------------------------------------------------------


def _chunk(spark, text: str):
    """Run the doc_chunk_windows column logic on one in-memory doc."""
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    toks = F.split(F.trim(F.col("text")), " ")
    n = F.size(toks)
    k_max = F.greatest(
        F.floor((n - F.lit(CHUNK_TOKENS) + F.lit(CHUNK_STRIDE - 1)) / CHUNK_STRIDE),
        F.lit(0),
    ).cast("int")
    rows = (
        df.select(
            toks.alias("toks"),
            n.alias("n_tokens"),
            F.explode(F.sequence(F.lit(0), k_max)).alias("i"),
        )
        .select(
            "i",
            F.slice(F.col("toks"), F.col("i") * CHUNK_STRIDE + 1, CHUNK_TOKENS).alias(
                "w"
            ),
        )
        .orderBy("i")
        .collect()
    )
    return [r.w for r in rows]


def test_chunk_short_doc_single_window(spark):
    """A doc shorter than one window yields exactly one (short) chunk."""
    chunks = _chunk(spark, "a b c")
    assert chunks == [["a", "b", "c"]]


def test_chunk_exact_window_no_tail(spark):
    """Exactly CHUNK_TOKENS tokens -> one full chunk, no empty tail."""
    words = [f"w{i}" for i in range(CHUNK_TOKENS)]
    chunks = _chunk(spark, " ".join(words))
    assert len(chunks) == 1 and chunks[0] == words


def test_chunk_overlap_and_coverage(spark):
    """Windows advance by stride, overlap by chunk-stride, and cover
    every token (the retrieval-corpus contract)."""
    n = CHUNK_TOKENS + CHUNK_STRIDE + 7  # forces 3 windows, short last
    words = [f"w{i}" for i in range(n)]
    chunks = _chunk(spark, " ".join(words))
    assert len(chunks) == 3
    assert chunks[0] == words[:CHUNK_TOKENS]
    assert chunks[1] == words[CHUNK_STRIDE:CHUNK_STRIDE + CHUNK_TOKENS]
    assert chunks[2] == words[2 * CHUNK_STRIDE:]
    # overlap between consecutive windows is chunk - stride tokens
    assert chunks[0][CHUNK_STRIDE:] == chunks[1][: CHUNK_TOKENS - CHUNK_STRIDE]
    # full coverage, order preserved
    seen = chunks[0] + chunks[1][CHUNK_TOKENS - CHUNK_STRIDE:] + \
        chunks[2][CHUNK_TOKENS - CHUNK_STRIDE:]
    assert seen == words


def test_chunk_udtf_agrees_with_native(spark):
    """The UDTF form and the Catalyst form produce identical chunk sets
    on the real corpus (shared-oracle invariant, checked directly)."""
    from amazon_books_review_spark.plans.llm_queries import (
        doc_chunk_windows,
        doc_chunk_windows_udtf,
    )

    native = doc_chunk_windows(spark, SF)
    udtf = doc_chunk_windows_udtf(spark, SF)
    assert native.exceptAll(udtf).count() == 0
    assert udtf.exceptAll(native).count() == 0


# ---------------------------------------------------------------------------
# Quantization edge semantics
# ---------------------------------------------------------------------------


def _quantize(spark, vec):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=vec, label=0)]
    )
    import tempfile
    import uuid

    path = f"{tempfile.gettempdir()}/abr_quant_{uuid.uuid4().hex}"
    df.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    ).write.parquet(f"{path}/embeddings.parquet")
    from amazon_books_review_spark.plans.llm_queries import embedding_quantize_int8

    try:
        return embedding_quantize_int8(spark, path).collect()[0]
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def test_quantize_zero_vector_no_nan(spark):
    """All-zero embeddings must quantize to zeros with finite error,
    not NaN/Inf (the 1e-12 scale clamp)."""
    row = _quantize(spark, [0.0, 0.0, 0.0, 0.0])
    assert row.q_sum == 0
    assert row.max_abs_err == 0.0


def test_quantize_extremes_hit_full_range(spark):
    """The max-|x| component maps exactly to +/-QUANT_LEVELS and its
    reconstruction is exact (symmetric scheme invariant)."""
    row = _quantize(spark, [1.0, -1.0, 0.5, 0.0])
    # scale = 1/127; q = [127, -127, 64, 0]; err at 0.5: |64/127 - 0.5|
    assert row.q_sum == 127 - 127 + 64 + 0
    assert row.max_abs_err == pytest.approx(abs(64 / QUANT_LEVELS - 0.5), abs=1e-9)


# ---------------------------------------------------------------------------
# Canonicalization + sampling invariants on the real corpus
# ---------------------------------------------------------------------------


def test_cluster_canonical_exactly_one_keeper_per_cluster(spark):
    from amazon_books_review_spark.plans.llm_queries import dedup_cluster_canonical

    out = dedup_cluster_canonical(spark, SF).cache()
    try:
        per_cluster = (
            out.groupBy("cluster_id")
            .agg(F.sum("keep_flag").alias("kept"), F.count(F.lit(1)).alias("n"))
        )
        bad = per_cluster.filter(F.col("kept") != 1).count()
        assert bad == 0, "every cluster must keep exactly one doc"
        # the corpus plants near-dup pairs, so real multi-member
        # clusters must exist for this test to mean anything
        assert per_cluster.filter(F.col("n") > 1).count() > 0
        # keeper is a max-length member of its cluster
        keeper = out.filter(F.col("keep_flag") == 1).select(
            "cluster_id", F.col("n_chars").alias("kept_chars")
        )
        viol = (
            out.join(keeper, "cluster_id")
            .filter(F.col("n_chars") > F.col("kept_chars"))
            .count()
        )
        assert viol == 0
    finally:
        out.unpersist()


def test_weighted_sample_is_stable_and_biased_long(spark):
    from amazon_books_review_spark.plans.llm_queries import quality_weighted_sample

    a = quality_weighted_sample(spark, SF)
    b = quality_weighted_sample(spark, SF).repartition(7)
    assert a.exceptAll(b).count() == 0, "sample must not churn on repartition"
    kept = a.count()
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < kept < total, "threshold sampling must actually drop docs"


def test_gopher_rules_fire_individually(spark):
    """Each Gopher rule must trip on a crafted violating document and
    pass on a clean one (the synthetic corpus never exercises the
    line-based rules, so this is their only coverage)."""
    from amazon_books_review_spark.functions.text import gopher_quality_flags

    good_words = ("the and to of that have with be " + "solid " * 60).strip()
    docs = [
        (0, good_words),                                  # clean -> keep
        (1, "short doc the and"),                         # word count
        (2, " ".join(["a"] * 80) + " the and"),           # mean word len < 3
        (3, good_words + " " + "#" * 1 * 1 + (" #" * 20)),  # symbol ratio
        (4, "\n".join(["- bullet line the and to of"] * 10)),  # bullet lines
        (5, "\n".join([good_words[:40] + "..."] * 10)),   # ellipsis lines
        (6, ("12345 " * 70) + "the and"),                 # alpha fraction
        (7, ("solid " * 70).strip()),                     # stopwords < 2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    assert out[0].keep is True
    assert out[1].ok_word_count is False and out[1].keep is False
    assert out[2].ok_mean_word_len is False
    assert out[3].ok_symbol_ratio is False
    assert out[4].ok_bullet_lines is False
    assert out[5].ok_ellipsis_lines is False
    assert out[6].ok_alpha_words is False
    assert out[7].ok_stopwords is False


def test_gopher_repetition_rules_fire(spark):
    """Crafted docs trip each repetition-rule family; a clean varied
    doc keeps."""
    from amazon_books_review_spark.functions.text import (
        gopher_repetition_flags,
    )

    varied = " ".join(f"w{i}" for i in range(100))
    docs = [
        (0, varied),                                      # clean
        (1, "\n".join(["same line here"] * 10)),          # dup lines (+chars)
        (2, ("ab " * 200).strip()),                       # top 2-gram mass
        (3, ("one two three four five " * 50).strip()),   # dup 5-gram mass
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_repetition_flags(df, "doc_id", "text").collect()}
    assert out[0].keep is True
    assert out[1].ok_dup_lines is False
    assert out[1].ok_dup_line_chars is False
    assert out[2].ok_top_2gram is False
    assert out[3].ok_dup_5gram is False
    for d in (1, 2, 3):
        assert out[d].keep is False

"""Benchmark decontamination: flag training documents that share long
word n-grams with a held-out evaluation/benchmark set.

The standard training-data hygiene step (GPT-3 reported 13-gram
overlap removal; later public pipelines commonly use 8-grams): a
training document containing any n-gram that also occurs in a
benchmark is flagged — and typically dropped or surgically cleaned —
so downstream evals measure generalization rather than memorized test
data.

Spark-first shape, and why it scales to 100 TB:

- The eval side is SMALL by construction (benchmarks are thousands of
  documents, not billions), so its distinct n-gram set is broadcast —
  the 100 TB training corpus is never shuffled for the membership
  check, only for its own per-doc aggregation, which groups on the
  corpus's natural key (``doc_id``).
- The corpus side is one linear shingle pass — slice+zip_with n-grams
  (see ``functions.text.word_ngrams``; the element_at-in-lambda form
  re-evaluates the tokenizer per element and must be avoided) —
  followed by a single map-side-combinable count.
- Determinism: plain string equality on whitespace shingles; the
  cross-engine oracle is SQL set intersection, no hashing involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amazon_books_review_spark.functions.dedup import shingles

#: Overlap gram length — 8 words, the common public-pipeline choice.
DECONTAM_NGRAM = 8


def eval_ngram_set(
    eval_df: DataFrame, id_col: str, text_col: str, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """The benchmark's distinct n-gram set (one ``shingle`` column).

    Distinct across the whole benchmark: membership is all the flag
    needs, and the dedup keeps the broadcast side minimal.
    """
    return shingles(eval_df, id_col, text_col, n=n).select("shingle").distinct()


def flag_contaminated(
    train_df: DataFrame,
    eval_grams: DataFrame,
    id_col: str,
    text_col: str,
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """Per training document: how many DISTINCT benchmark n-grams it
    contains, and a 0/1 ``contaminated`` flag.

    Every training doc is returned (clean docs with 0) so the caller
    can either anti-join the flagged ids or keep the counts for
    contamination-rate reporting.  ``eval_grams`` is broadcast: the
    corpus side never shuffles for the membership probe.
    """
    train_grams = shingles(train_df, id_col, text_col, n=n)
    hits = (
        train_grams.join(F.broadcast(eval_grams), "shingle")
        # shingles() is distinct-per-doc, so count(*) == distinct grams hit
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_eval_grams_hit"))
    )
    return (
        train_df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_eval_grams_hit"), F.lit(0).cast("long")).alias(
                "n_eval_grams_hit"
            ),
            (F.col("n_eval_grams_hit").isNotNull()).cast("int").alias("contaminated"),
        )
    )

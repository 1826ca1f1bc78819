"""The complete reference workflow as one call.

A user of the reference runs three notebooks by hand: clean books
(BD), clean ratings (BR), then the streaming medallion (MA).  This
module is that workflow as a single parameterized entry point over
the SAME operator functions — point it at the two Kaggle CSVs and an
output root:

    cfg = ReferencePipelineConfig(books_csv=..., ratings_csv=..., out_root=...)
    tables = run_reference_pipeline(spark, cfg)            # batch
    tables = run_reference_pipeline(spark, cfg, streaming=True)  # MA-style

Differences from the notebooks, all deliberate (SURVEY §4.2):
explicit raw schemas (no inference pass), explicit write modes
(re-runnable), one orchestrator for the streaming queries, and a
``normalized`` switch that skips the row-multiplying double explode.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from amazon_books_review_spark.plans.books_pipeline import (
    BOOK_DETAILS_RAW_SCHEMA,
    BOOKS_RATINGS_RAW_SCHEMA,
    clean_books_details,
    clean_books_ratings,
    gold_users_count,
    silver_books_reviews,
)
from amazon_books_review_spark.session import ensure_session_confs
from amazon_books_review_spark.sources.io import read_csv, read_parquet, write_parquet
from amazon_books_review_spark.streaming.medallion import (
    MedallionPaths,
    run_streaming_medallion,
)


@dataclass
class ReferencePipelineConfig:
    books_csv: str
    ratings_csv: str
    out_root: str
    normalized: bool = False  # True: arrays instead of exploded rows
    fidelity: bool = True  # False: scale-mode silver/gold


def run_reference_pipeline(
    spark: SparkSession,
    cfg: ReferencePipelineConfig,
    streaming: bool = False,
) -> dict[str, DataFrame]:
    """CSV -> cleaned parquet -> silver -> gold, batch or streaming.

    Returns the materialized tables keyed as
    ``details/ratings/silver/gold`` (+ bronze tables when streaming).
    """
    ensure_session_confs(spark)
    details_out = os.path.join(cfg.out_root, "cleaned", "books_details")
    ratings_out = os.path.join(cfg.out_root, "cleaned", "books_ratings")

    details = clean_books_details(
        read_csv(spark, cfg.books_csv, schema=BOOK_DETAILS_RAW_SCHEMA),
        normalized=cfg.normalized,
    )
    ratings = clean_books_ratings(
        read_csv(spark, cfg.ratings_csv, schema=BOOKS_RATINGS_RAW_SCHEMA)
    )
    write_parquet(details, details_out)
    write_parquet(ratings, ratings_out)

    if streaming:
        paths = MedallionPaths(
            details_in=details_out,
            reviews_in=ratings_out,
            root=os.path.join(cfg.out_root, "medallion"),
        )
        out = run_streaming_medallion(spark, paths, fidelity=cfg.fidelity)
        out["details"] = read_parquet(spark, details_out)
        out["ratings"] = read_parquet(spark, ratings_out)
        return out

    silver = silver_books_reviews(
        read_parquet(spark, details_out),
        read_parquet(spark, ratings_out),
        fidelity=cfg.fidelity,
    )
    silver_out = os.path.join(cfg.out_root, "silver", "amazon_books_reviews")
    write_parquet(silver, silver_out)
    gold = gold_users_count(read_parquet(spark, silver_out))
    gold_out = os.path.join(cfg.out_root, "gold", "books_users_count")
    write_parquet(gold, gold_out)
    return {
        "details": read_parquet(spark, details_out),
        "ratings": read_parquet(spark, ratings_out),
        "silver": read_parquet(spark, silver_out),
        "gold": read_parquet(spark, gold_out),
    }

"""End-to-end reference workflow: CSV in -> gold out, batch AND
streaming, from one call — the 'reference user switches repos' test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_books_review_spark.plans.pipeline import (
    ReferencePipelineConfig,
    run_reference_pipeline,
)
from tests.fixtures import details_df, ratings_df


@pytest.fixture()
def csv_inputs(spark, tmp_path):
    """Fixture rows written as real CSV files (quoting exercised)."""
    b, r = str(tmp_path / "books_csv"), str(tmp_path / "ratings_csv")
    details_df(spark).write.option("header", True).mode("overwrite").csv(b)
    ratings_df(spark).write.option("header", True).mode("overwrite").csv(r)
    return b, r


@pytest.mark.parametrize("streaming", [False, True])
def test_reference_pipeline_csv_to_gold(spark, tmp_path, csv_inputs, streaming):
    books_csv, ratings_csv = csv_inputs
    cfg = ReferencePipelineConfig(
        books_csv=books_csv,
        ratings_csv=ratings_csv,
        out_root=str(tmp_path / f"out_{streaming}"),
    )
    tables = run_reference_pipeline(spark, cfg, streaming=streaming)

    gold = {
        (r.Title, r.categories): r.users_count for r in tables["gold"].collect()
    }
    # golden values from tests/test_books_pipeline.py
    assert gold[("Spark Basics", "Tech")] == 6
    assert gold[("Spark Basics", " Data")] == 6
    assert gold[("Old Tome", "History")] == 1
    assert all(t not in {k[0] for k in gold} for t in ("Ghost Book", "Pre2011 Only"))

    # the cleaned tables round-tripped the CSV quoting correctly
    esc = tables["details"].filter(F.col("Title") == "Escapes").first()
    assert '"' not in esc.publisher and "\\" not in esc.publisher


def test_pipeline_rerunnable(spark, tmp_path, csv_inputs):
    """Explicit overwrite modes: the reference fails on re-run
    (errorifexists, BD:203); this pipeline must not."""
    books_csv, ratings_csv = csv_inputs
    cfg = ReferencePipelineConfig(
        books_csv=books_csv,
        ratings_csv=ratings_csv,
        out_root=str(tmp_path / "out_rerun"),
    )
    g1 = run_reference_pipeline(spark, cfg)["gold"].count()
    g2 = run_reference_pipeline(spark, cfg)["gold"].count()
    assert g1 == g2

"""Single-pass expectations gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_books_review_spark.operators import validation


def test_violation_counts_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 120.0)], "id long, v double"
    )
    report = validation.violation_counts(
        df,
        {
            "v_positive": F.col("v") <= 0,
            "v_under_100": F.col("v") >= 100,
        },
    )
    got = {r.rule: r.n_violations for r in report.collect()}
    # NULL comparisons count as violations (unknown is not a pass)
    assert got == {"v_positive": 2, "v_under_100": 2}
    # one pass: a single aggregate, no per-rule scans
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        report.explain("formatted")
    # AQE's formatted output repeats the plan up to 3 times
    # (initial/final/reference list); one logical scan => <= 3 prints
    assert buf.getvalue().count("Scan") <= 3


def test_uniqueness_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (1, "b")], "k long, s string"
    )
    dups = {(r.k, r.s): r.n_rows
            for r in validation.uniqueness_violations(df, ["k", "s"]).collect()}
    assert dups == {(1, "a"): 2}


def test_approx_distinct_within_rsd_bound(spark):
    """HLL sketch accuracy: approx_count_distinct at rsd=0.02 lands
    within a generous multiple of the bound against the exact count
    (the no-oracle catalog row's missing property check)."""
    from amazon_books_review_spark.plans.analytics_queries import (
        approx_distinct_users,
    )
    from amazon_books_review_spark.sources.io import load_table

    sf = "/root/testdata/sf0.01"
    approx = {
        r.event_type: r.n_distinct_approx
        for r in approx_distinct_users(spark, sf).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(5, 5 * 0.02 * n), (
            f"{et}: approx {approx[et]} vs exact {n}"
        )


def test_assert_valid_raises_with_report(spark):
    df = spark.createDataFrame([(1,), (-2,)], "v long")
    validation.assert_valid(df, {"never": F.lit(False)})  # passes
    with pytest.raises(ValueError, match="v_positive=1"):
        validation.assert_valid(df, {"v_positive": F.col("v") <= 0})

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


def test_approx_distinct_audit_verdicts_true(spark):
    """The audited shape (r6 verdict #4): every per-type HLL estimate
    must land inside the tolerance so the hashed verdict column is
    deterministically TRUE — the property the DuckDB oracle pins."""
    from amazon_books_review_spark.plans.analytics_queries import (
        approx_distinct_users,
    )

    rows = approx_distinct_users(spark, "/root/testdata/sf0.01").collect()
    assert rows, "no event types found"
    for r in rows:
        assert r.exact_users > 0
        assert r.est_within_tol is True, (
            f"{r.event_type}: estimate outside tolerance of {r.exact_users}"
        )


def test_assert_valid_raises_with_report(spark):
    df = spark.createDataFrame([(1,), (-2,)], "v long")
    validation.assert_valid(df, {"never": F.lit(False)})  # passes
    with pytest.raises(ValueError, match="v_positive=1"):
        validation.assert_valid(df, {"v_positive": F.col("v") <= 0})

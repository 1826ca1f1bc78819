"""Declarative data-quality validation — the expectations gate every
production ingest runs before promoting a batch (null ratios, range
checks, set membership, uniqueness).

Shape: ALL rules evaluate in ONE pass over the data (a single
aggregate of conditional sums — map-side combined, one tiny shuffle),
then unpivot to a (rule, n_violations) report.  Never one scan per
rule: at 100 TB the scan is the cost and N rules must not mean N
scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation_counts(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """One row per rule: how many input rows VIOLATE it.

    ``rules`` maps rule name -> a boolean Column that is true when
    the row violates the rule.  Null condition results count as
    violations (an unknown is not a pass).
    """
    counters = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)
        ).cast("long").alias(name)
        for name, cond in sorted(rules.items())
    ]
    wide = df.agg(*counters)
    stack_expr = ", ".join(f"'{name}', `{name}`" for name in sorted(rules))
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack_expr}) as (rule, n_violations)")
    )


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Duplicate-key report: keys appearing more than once, with their
    multiplicity.  One groupBy on the key (the unavoidable shuffle);
    emits nothing when the key is unique."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def assert_valid(df: DataFrame, rules: dict[str, Column]) -> None:
    """Gate form: raise if any rule is violated (the report is the
    exception message).  The single collect is a tiny per-rule
    aggregate — the scan happened distributed."""
    report = violation_counts(df, rules).filter(F.col("n_violations") > 0)
    bad = report.collect()
    if bad:
        lines = ", ".join(f"{r.rule}={r.n_violations}" for r in bad)
        raise ValueError(f"data-quality violations: {lines}")

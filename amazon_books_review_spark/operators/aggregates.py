"""Aggregation operators — A1-A4 plus the Catalyst-free extensions.

The reference's aggregation surface is a streaming grouped count
(MA:162-166), a whole-table mean (BR:102), scalar counts, and a global
distinct (SURVEY.md §2.4).  Everything here is built-in Catalyst
aggregation — partial (map-side) aggregation, whole-stage codegen and
AQE partition coalescing apply automatically.

Cross-engine determinism convention: floating-point SUMs are computed
over DECIMAL(18,2)-cast inputs (exact, order-independent) and cast
back to DOUBLE at the end; AVGs are exact-sum / count.  Plain double
sums are order-dependent and would flap the driver's value-hash.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_count(
    df: DataFrame, keys: Sequence[str], count_col: str, alias: str = "users_count"
) -> DataFrame:
    """A1 — ``COUNT(col) GROUP BY keys`` (MA:162-166).  Works on batch
    and streaming DataFrames identically (complete/update mode on
    streams)."""
    return df.groupBy(*keys).agg(F.count(count_col).alias(alias))


def exact_sum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double column: cast each value to
    DECIMAL(18,scale) (exact at source precision — the test data
    carries 2 decimals), sum exactly, return DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def exact_avg(col: str | Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Hierarchical subtotals (GROUP BY ROLLUP).  Free from Catalyst —
    one shuffle, subtotal rows carry NULL group keys."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """All grouping-set combinations (GROUP BY CUBE)."""
    return df.cube(*keys).agg(*aggs)


def distinct_count(
    df: DataFrame, keys: Sequence[str], col: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT col) per group.  Spark plans this as
    expand + two-phase aggregation — one extra shuffle versus a plain
    count; use :func:`approx_distinct_count` when a ~2% error is
    acceptable at 100 TB."""
    return df.groupBy(*keys).agg(F.count_distinct(F.col(col)).alias(alias))


def approx_distinct_count(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05,
    alias: str = "n_distinct_approx",
) -> DataFrame:
    """HyperLogLog++ distinct estimate: single pass, fixed-size state,
    mergeable — the scale path for cardinality at 100 TB (exact
    distinct shuffles every distinct value)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(F.col(col), rsd).alias(alias)
    )

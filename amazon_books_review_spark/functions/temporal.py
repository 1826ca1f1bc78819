"""Temporal functions — the reference's date/time surface (SURVEY §2.8).

BD = Amazon-book-review_books_details.py, BR = _books_reviews.py,
MA = Amazon_books_review_medallion_architecture.py.

Semantics pinned by the engine session (session.py):
- ``spark.sql.legacy.timeParserPolicy=LEGACY`` so ``to_date(c,"yyyy")``
  parses bare-year strings (BD:109-113).
- ``spark.sql.session.timeZone=UTC`` so epoch<->wall-clock conversions
  (BR:76) are host-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def year_of(col: str | Column) -> Column:
    """F5 — calendar year of a date/timestamp (BD:113, MA:117/121)."""
    return F.year(col)


def parse_year(col: str | Column, fmt: str = "yyyy") -> Column:
    """F6 — parse a year-only string to a date (needs LEGACY parser,
    BD:111-113).  Returns Jan 1 of that year as DateType."""
    return F.to_date(col, fmt)


def derive_publish_year(df: DataFrame, src: str, out: str) -> DataFrame:
    """BD:113 — ``year(to_date(publishedDate, "yyyy"))`` as one op."""
    return df.withColumn(out, F.year(F.to_date(F.col(src), "yyyy")))


def unix_to_wallclock(df: DataFrame, src: str, out: str) -> DataFrame:
    """F7 — unix seconds -> ``yyyy-MM-dd HH:mm:ss`` STRING (BR:76).

    ``from_unixtime`` returns a string, not a timestamp — downstream
    ``YEAR(review_Time)`` (MA:121) then implicitly casts.  Preserved
    exactly; use :func:`unix_to_timestamp` for the tightened variant.
    """
    return df.withColumn(out, F.from_unixtime(F.col(src).cast("long")))


def unix_to_timestamp(df: DataFrame, src: str, out: str) -> DataFrame:
    """Tightened F7: unix seconds -> real TimestampType (scale-safe:
    typed timestamps keep predicate pushdown and partition pruning
    working downstream, unlike the reference's string column)."""
    return df.withColumn(out, F.timestamp_seconds(F.col(src).cast("long")))


def year_range_predicate(col: str | Column, year_exclusive: int) -> Column:
    """P6 — the pushdown-friendly rewrite of ``YEAR(c) > y`` (MA:121).

    ``year(c) > y`` wraps the column in a function, so the parquet
    scan receives no filter and no partition pruning happens; the
    equivalent half-open range predicate pushes down cleanly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c >= F.lit(f"{year_exclusive + 1}-01-01")


def filter_year_after(df: DataFrame, col: str, year_exclusive: int) -> DataFrame:
    """Rows with ``year(col) > year_exclusive``, expressed as a range
    scan: ``col >= '{year+1}-01-01'`` (SURVEY §4.2.2)."""
    return df.filter(F.col(col) >= F.lit(f"{year_exclusive + 1}-01-01"))

"""Flagship query — the reference's silver->gold semantics on testdata.

Reproduces the medallion pipeline's analytical core
(Amazon_books_review_medallion_architecture.py:116-121 join+filter,
:162-166 grouped count) transposed onto the driver's TPC-H-ish tables
(FIXTURES.md §B):

    orders INNER JOIN customer ON o_custkey = c_custkey   (J1)
    WHERE o_orderdate >= '1996-01-01'                     (P6, see note)
    GROUP BY c_mktsegment, year(o_orderdate)              (A1)
    COUNT(o_orderkey)

Scale notes:
- The reference writes the filter as ``YEAR(review_Time) > 2010``
  (MA:121), which wraps the column in a function and defeats predicate
  pushdown and partition pruning.  We use the equivalent range
  predicate ``o_orderdate >= '1996-01-01'`` so the parquet scan
  receives a pushed filter (visible as PushedFilters in .explain).
- ``customer`` is the small dimension side; Spark's AQE/broadcast
  threshold picks a broadcast-hash join at bench scale on its own, and
  we hint it explicitly — at 100 TB the orders fact side must never be
  shuffled for this join.
- The aggregation is a hash aggregate with map-side partial combine;
  grouping keys are low-cardinality (segment x year), so the shuffle
  after partial agg is tiny regardless of input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_books_review_spark.sources.io import load_table


def flagship_gold_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped user/order count per segment and year (gold analog)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    joined = orders.join(
        F.broadcast(customer),
        orders.o_custkey == customer.c_custkey,
        "inner",
    )
    return (
        joined
        # Range predicate, not year(col) > 1995 — pushdown-friendly.
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
        .groupBy(
            F.col("c_mktsegment"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.count("o_orderkey").alias("users_count"))
    )


FLAGSHIP_ORACLE_SQL = """
SELECT
    c_mktsegment,
    year(o_orderdate) AS order_year,
    count(o_orderkey) AS users_count
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY c_mktsegment, year(o_orderdate)
"""

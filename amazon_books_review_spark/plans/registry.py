"""Catalog registrations: one @query entry per SURVEY.md §2 operator.

This module is imported for its side effects by
``amazon_books_review_spark.plans.catalog._load_all``.
"""

from __future__ import annotations

from amazon_books_review_spark.plans.catalog import query
from amazon_books_review_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    flagship_gold_rollup,
)
from amazon_books_review_spark.plans.analytics_queries import ANALYTICS_QUERIES
from amazon_books_review_spark.plans.books_csv_queries import BOOKS_CSV_QUERIES
from amazon_books_review_spark.plans.extended_queries import EXTENDED_QUERIES
from amazon_books_review_spark.plans.format_queries import FORMAT_QUERIES
from amazon_books_review_spark.plans.llm_queries import LLM_QUERIES
from amazon_books_review_spark.plans.pyds_queries import PYDS_QUERIES
from amazon_books_review_spark.plans.reshape_queries import RESHAPE_QUERIES
from amazon_books_review_spark.plans.scale_ops_queries import SCALE_OPS_QUERIES
from amazon_books_review_spark.plans.northstar_queries import NORTHSTAR_QUERIES
from amazon_books_review_spark.plans.reference_queries import REFERENCE_QUERIES
from amazon_books_review_spark.plans.traindata_queries import TRAINDATA_QUERIES
from amazon_books_review_spark.plans.corpus_stats_queries import CORPUS_STATS_QUERIES
from amazon_books_review_spark.plans.behavior_queries import BEHAVIOR_QUERIES
from amazon_books_review_spark.plans.sqlsurface_queries import SQLSURFACE_QUERIES
from amazon_books_review_spark.plans.governance_queries import GOVERNANCE_QUERIES
from amazon_books_review_spark.plans.lakehouse_queries import LAKEHOUSE_QUERIES
from amazon_books_review_spark.plans.graph_queries import GRAPH_QUERIES
from amazon_books_review_spark.plans.retrieval_queries import RETRIEVAL_QUERIES
from amazon_books_review_spark.plans.selection_queries import SELECTION_QUERIES
from amazon_books_review_spark.streaming.queries import STREAMING_QUERIES

query(
    "flagship_gold_rollup",
    FLAGSHIP_ORACLE_SQL,
    doc="J1+P6+A1: silver/gold medallion semantics on orders x customer",
)(flagship_gold_rollup)

for _name, _fn, _oracle, _doc in (
    REFERENCE_QUERIES
    + ANALYTICS_QUERIES
    + STREAMING_QUERIES
    + NORTHSTAR_QUERIES
    + EXTENDED_QUERIES
    + BOOKS_CSV_QUERIES
    + TRAINDATA_QUERIES
    + FORMAT_QUERIES
    + LLM_QUERIES
    + PYDS_QUERIES
    + RESHAPE_QUERIES
    + SCALE_OPS_QUERIES
    + CORPUS_STATS_QUERIES
    + BEHAVIOR_QUERIES
    + SQLSURFACE_QUERIES
    + GOVERNANCE_QUERIES
    + LAKEHOUSE_QUERIES
    + SELECTION_QUERIES
    + RETRIEVAL_QUERIES
    + GRAPH_QUERIES
):
    query(_name, _oracle, doc=_doc)(_fn)

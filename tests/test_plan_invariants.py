"""Physical-plan regression tests: the 100 TB-relevant plan
properties asserted, not eyeballed (PERF.md invariants).

These catch silent regressions: a lost filter pushdown, a broadcast
that degraded to a shuffle, a generator lambda that re-inlines an
expensive expression.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from amazon_books_review_spark.plans.catalog import all_queries

SF = "/root/testdata/sf0.001"
QUERIES = all_queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()]


def test_flagship_pushdown_and_broadcast(spark):
    plan = plan_of(spark, "flagship_gold_rollup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert any("o_orderdate" in f and "GreaterThanOrEqual" in f for f in pushed_filters(plan))


def test_q6_all_predicates_reach_scan(spark):
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    fs = " ".join(pushed_filters(plan))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in fs, f"{col} predicate not pushed: {fs}"


def test_q5_no_cartesian_no_smj(spark):
    plan = plan_of(spark, "tpch_q5_regional_revenue")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_cosine_topk_only_intended_nlj(spark):
    """The broadcast probe cross-join is the ONLY nested-loop, and the
    corpus side is never shuffled before scoring."""
    plan = plan_of(spark, "similarity_cosine_topk")
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # AQE prints initial+final
    assert "CartesianProduct" not in plan


def test_asof_join_bounded_shuffles(spark):
    """Union+window composition: shuffles stay bounded (per-input
    partitioning + window), no join blow-up."""
    plan = plan_of(spark, "asof_join_events_orders")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # formatted output with AQE lists initial+final; cap generously
    assert plan.count("Exchange") <= 8


@pytest.mark.parametrize(
    "name",
    ["text_token_stats", "text_quality_scores", "scalar_functions_showcase"],
)
def test_map_only_queries_have_no_exchange(spark, name):
    """Pure per-row analysis stages must never shuffle."""
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, f"{name} acquired a shuffle"

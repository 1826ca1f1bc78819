"""copurchase_edges fan-out fallback (VERDICT r6 #6): a synthetic
wide-order input must route its hot orders through the self-join
branch and still produce the exact edge set of the naive self-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_books_review_spark.plans.scale_ops_queries import copurchase_edges


def _naive_edges(li, directed: bool):
    """Reference semantics: the fact self-join."""
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a = lp.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = lp.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = a.join(b, "l_orderkey")
    if directed:
        pairs = pairs.filter(F.col("src") != F.col("dst")).select("src", "dst")
    else:
        pairs = pairs.filter(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
    return pairs.distinct()


def _wide_input(spark):
    """One order with 40 distinct parts (wide), many with 3 (bounded);
    duplicates sprinkled in so distinct-before-count is exercised."""
    rows = []
    for p in range(40):
        rows.append((1000, p))
        rows.append((1000, p))  # duplicate lineitem, same part
    for o in range(10):
        for p in range(3):
            rows.append((o, 100 + 7 * o + p))
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_hybrid_equals_naive_on_wide_input(spark):
    li = _wide_input(spark)
    for directed in (True, False):
        naive = set(map(tuple, _naive_edges(li, directed).collect()))
        hybrid = set(
            map(tuple, copurchase_edges(li, directed, max_fanout=16).collect())
        )
        assert hybrid == naive, f"directed={directed}"
        assert len(hybrid) > 0


def test_wide_branch_actually_engages(spark):
    """With the threshold below the hot order's fan-out, the set
    branch alone would MISS the hot order's pairs — prove the
    fallback contributes them."""
    li = _wide_input(spark)
    edges = set(
        map(tuple, copurchase_edges(li, False, max_fanout=16).collect())
    )
    # pairs only the 40-part order can produce
    assert (0, 1) in edges and (38, 39) in edges
    # set-branch-only pairs are present too (both branches ran)
    assert (100, 101) in edges


def test_hybrid_matches_set_path_on_bounded_input(spark):
    """On an input where nothing exceeds the threshold the hybrid and
    the default single-shuffle path agree exactly."""
    li = _wide_input(spark).filter(F.col("l_orderkey") != 1000)
    default = set(map(tuple, copurchase_edges(li, True).collect()))
    hybrid = set(
        map(tuple, copurchase_edges(li, True, max_fanout=16).collect())
    )
    assert default == hybrid


def test_threshold_boundary_inclusive(spark):
    """fan == max_fanout stays on the set path (<=); fan == max_fanout+1
    goes wide — both produce the same edges either way."""
    rows = [(1, p) for p in range(5)] + [(2, p) for p in range(6)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    naive = set(map(tuple, _naive_edges(li, False).collect()))
    hybrid = set(map(tuple, copurchase_edges(li, False, max_fanout=5).collect()))
    assert hybrid == naive

"""operators/cdc.py — snapshot change feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_books_review_spark.operators.cdc import snapshot_diff


def test_change_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k long, s string, v long"
    )
    rows = snapshot_diff(old, new, "k").collect()
    feed = {(r.k, r._change_type): (r.s, r.v) for r in rows}
    assert feed == {
        (2, "update_preimage"): ("b", 20),
        (2, "update_postimage"): ("B", 20),
        (3, "delete"): ("c", 30),
        (4, "insert"): ("d", 40),
    }
    assert len(rows) == 4  # unchanged k=1 emits nothing


def test_null_safe_comparison(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    rows = snapshot_diff(old, new, "k").collect()
    kinds = {(r.k, r._change_type) for r in rows}
    # null == null is NOT a change; x -> null IS
    assert kinds == {(2, "update_preimage"), (2, "update_postimage")}


def test_compare_cols_subset(spark):
    old = spark.createDataFrame([(1, "a", 10)], "k long, s string, v long")
    new = spark.createDataFrame([(1, "a", 99)], "k long, s string, v long")
    # restricted to s, the v change is invisible
    assert snapshot_diff(old, new, "k", compare_cols=["s"]).count() == 0
    assert snapshot_diff(old, new, "k", compare_cols=["v"]).count() == 2


def test_identical_snapshots_empty_feed(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    assert snapshot_diff(df, df, "k").count() == 0


def test_cdc_replays_merge(spark):
    """Applying the feed to the old snapshot reproduces the new one —
    the round-trip that makes CDF a correct incremental-sync carrier."""
    from amazon_books_review_spark.operators.merge import merge_dataframes
    from amazon_books_review_spark.plans.lakehouse_queries import (
        _orders_cents,
        merge_upsert_orders,
    )

    sf = "/root/testdata/sf0.001"
    old = _orders_cents(spark, sf)
    new = merge_upsert_orders(spark, sf)
    from amazon_books_review_spark.operators.cdc import snapshot_diff

    feed = snapshot_diff(old, new, "o_orderkey")
    upserts = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    deletes = feed.filter(F.col("_change_type") == "delete").drop("_change_type")
    replayed = merge_dataframes(
        old.join(deletes.select("o_orderkey"), "o_orderkey", "left_anti"),
        upserts,
        "o_orderkey",
    )
    assert replayed.exceptAll(new).count() == 0
    assert new.exceptAll(replayed).count() == 0

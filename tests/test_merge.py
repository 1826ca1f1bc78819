"""operators/merge.py — relational MERGE INTO semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_books_review_spark.operators.merge import merge_dataframes


def _t(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, name string, v long",
    )


def _s(spark):
    return spark.createDataFrame(
        [(2, "B", 200), (3, "C", 300), (9, "i", 900)],
        "k long, name string, v long",
    )


def test_plain_upsert_updates_and_inserts(spark):
    out = {r.k: (r.name, r.v)
           for r in merge_dataframes(_t(spark), _s(spark), "k").collect()}
    assert out == {
        1: ("a", 10),      # target-only, kept (no delete clause)
        2: ("B", 200),     # matched -> full-row replace
        3: ("C", 300),
        4: ("d", 40),
        9: ("i", 900),     # source-only -> insert
    }


def test_update_set_partial_columns(spark):
    out = {
        r.k: (r.name, r.v)
        for r in merge_dataframes(
            _t(spark), _s(spark), "k",
            update_set={"v": F.col("t_v") + F.col("s_v")},
        ).collect()
    }
    # v merges; name is UNLISTED in the partial SET, so it keeps the
    # TARGET value — SQL MERGE 'UPDATE SET v = ...' semantics
    assert out[2] == ("b", 220)
    assert out[3] == ("c", 330)
    assert out[9] == ("i", 900)  # inserts unaffected by update_set


def test_update_set_none_is_full_row_replace(spark):
    """update_set=None is UPDATE SET * — every column from source."""
    out = {
        r.k: (r.name, r.v)
        for r in merge_dataframes(_t(spark), _s(spark), "k").collect()
    }
    assert out[2] == ("B", 200)
    assert out[3] == ("C", 300)


def test_matched_condition_gates_update(spark):
    out = {
        r.k: (r.name, r.v)
        for r in merge_dataframes(
            _t(spark), _s(spark), "k",
            matched_condition=F.col("s_v") > 250,
        ).collect()
    }
    assert out[2] == ("b", 20)    # condition false -> target row kept
    assert out[3] == ("C", 300)   # condition true -> updated


def test_delete_when_removes_target_only_rows(spark):
    out = {
        r.k
        for r in merge_dataframes(
            _t(spark), _s(spark), "k",
            delete_when=F.col("t_v") >= 40,
        ).collect()
    }
    assert out == {1, 2, 3, 9}    # k=4 (v=40, target-only) deleted
    # matched rows are never deleted by the BY SOURCE clause
    assert 2 in out and 3 in out


def test_composite_key(spark):
    t = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 11), (2, "x", 20)], "k long, sub string, v long"
    )
    s = spark.createDataFrame(
        [(1, "y", 111), (3, "z", 30)], "k long, sub string, v long"
    )
    out = {(r.k, r.sub): r.v for r in merge_dataframes(t, s, ["k", "sub"]).collect()}
    assert out == {(1, "x"): 10, (1, "y"): 111, (2, "x"): 20, (3, "z"): 30}


def test_merge_count_arithmetic_on_catalog_query(spark):
    """Row-count identity: |merged| == |target| - |deleted| + |inserted|."""
    from amazon_books_review_spark.plans.lakehouse_queries import (
        MERGE_DEL_MOD,
        MERGE_INS_MOD,
        MERGE_UPD_MOD,
        merge_upsert_orders,
    )
    from amazon_books_review_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    n = orders.count()
    n_ins = orders.filter(F.col("o_orderkey") % MERGE_INS_MOD == 0).count()
    # WHEN NOT MATCHED BY SOURCE only touches target-ONLY rows: a
    # delete-flagged key that is also in the update set is updated,
    # not deleted (one such key exists at sf0.001 — keep it excluded)
    n_del = orders.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderkey") % MERGE_DEL_MOD == 0)
        & (F.col("o_orderkey") % MERGE_UPD_MOD != 0)
    ).count()
    assert merge_upsert_orders(spark, sf).count() == n - n_del + n_ins

"""Catalog-persistent tables (C1-C4): saveAsTable / spark.table /
DESCRIBE EXTENDED — the reference's metastore idiom (MA:39, MA:88,
MA:99-101) on OSS Spark."""

from __future__ import annotations

import pytest

from amazon_books_review_spark.sources import table_catalog as tc


@pytest.fixture()
def persisted(spark):
    df = spark.createDataFrame(
        [(1, "AUTOMOBILE", 10), (2, "BUILDING", 20), (3, "AUTOMOBILE", 30)],
        "id long, segment string, amount long",
    )
    tc.save_as_table(df, "tc_test_table", partition_by=["segment"])
    yield df
    tc.drop_table(spark, "tc_test_table")


def test_save_and_read_back(spark, persisted):
    got = tc.read_table(spark, "tc_test_table")
    assert sorted(map(tuple, got.select("id", "segment", "amount").collect())) == sorted(
        map(tuple, persisted.collect())
    )


def test_describe_extended_shape(spark, persisted):
    rows = tc.describe_extended(spark, "tc_test_table").collect()
    # standard 3-column relation
    assert [f.name for f in tc.describe_extended(spark, "tc_test_table").schema] == [
        "col_name",
        "data_type",
        "comment",
    ]
    col_names = {r.col_name for r in rows}
    # column section lists every column, detailed section follows
    assert {"id", "segment", "amount"} <= col_names
    assert "# Detailed Table Information" in col_names
    detail = {r.col_name: r.data_type for r in rows if r.col_name}
    assert detail.get("Provider") == "parquet"
    assert "tc_test_table" in (detail.get("Table") or detail.get("Name") or "")


def test_table_details_parsed(spark, persisted):
    info = tc.table_details(spark, "tc_test_table")
    assert info["name"] == "tc_test_table"
    assert info["table_type"] == "MANAGED"
    assert info["is_temporary"] is False
    assert info["columns"]["id"] == "bigint"
    assert info["partition_columns"] == ["segment"]
    assert info["provider"] == "parquet"
    assert info["location"]  # managed tables still expose a location


def test_overwrite_is_idempotent(spark, persisted):
    df2 = spark.createDataFrame([(9, "X", 99)], "id long, segment string, amount long")
    tc.save_as_table(df2, "tc_test_table", partition_by=["segment"])
    assert [tuple(r) for r in tc.read_table(spark, "tc_test_table")
            .select("id", "segment", "amount").collect()] == [(9, "X", 99)]


def test_drop_table(spark):
    df = spark.createDataFrame([(1,)], "id long")
    tc.save_as_table(df, "tc_drop_me")
    assert spark.catalog.tableExists("tc_drop_me")
    tc.drop_table(spark, "tc_drop_me")
    assert not spark.catalog.tableExists("tc_drop_me")


def test_analyze_statistics_feed_cbo(spark):
    """C5+ (scale posture): ANALYZE TABLE table+column statistics land
    in the metastore and the cost-based optimizer consumes them —
    `EXPLAIN COST` shows the analyzed rowCount, which is what join-side
    selection and AQE sizing key off at cluster scale."""
    df = spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS k", "CAST(id AS STRING) AS s"
    )
    tc.save_as_table(df, "tc_stats_table")
    try:
        spark.sql("ANALYZE TABLE tc_stats_table COMPUTE STATISTICS")
        spark.sql(
            "ANALYZE TABLE tc_stats_table COMPUTE STATISTICS FOR COLUMNS id, k"
        )
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED tc_stats_table").collect()
        }
        assert "Statistics" in desc and "1000 rows" in desc["Statistics"]
        coldesc = {
            r.info_name: r.info_value
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED tc_stats_table id"
            ).collect()
        }
        assert coldesc.get("min") == "0" and coldesc.get("max") == "999"
        assert coldesc.get("distinct_count") not in (None, "NULL")

        old = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            cost = spark.sql(
                "EXPLAIN COST SELECT k, count(*) FROM tc_stats_table "
                "WHERE id < 100 GROUP BY k"
            ).collect()[0][0]
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
        # relation carries the analyzed count; the filter estimate
        # (~101 of 1000) comes from the id min/max column stats —
        # proof CBO consumed them, not just that ANALYZE ran
        assert "rowCount=1.00E+3" in cost
        assert "rowCount=101" in cost
    finally:
        tc.drop_table(spark, "tc_stats_table")


def test_analyze_table_populates_cbo_stats(spark):
    """ANALYZE TABLE feeds the CBO: row_count lands in the table
    Statistics row and per-column NDV/min/max become visible —
    the freshness discipline 100 TB planning depends on."""
    from amazon_books_review_spark.sources.table_catalog import (
        analyze_table,
        drop_table,
        save_as_table,
        table_stats,
    )

    df = spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS grp", "CAST(id AS STRING) AS s"
    )
    save_as_table(df, "abr_cbo_stats_t")
    try:
        before = table_stats(spark, "abr_cbo_stats_t")
        assert before["row_count"] is None  # no ANALYZE yet
        analyze_table(spark, "abr_cbo_stats_t", columns=["id", "grp"])
        after = table_stats(spark, "abr_cbo_stats_t")
        assert after["row_count"] == 1000
        assert after["size_bytes"] and after["size_bytes"] > 0
        grp = after["columns"]["grp"]
        assert grp["min"] == "0" and grp["max"] == "6"
        assert int(grp["distinct_count"]) == 7
        assert int(grp["num_nulls"]) == 0
        assert int(after["columns"]["id"]["distinct_count"]) >= 900  # NDV approx
        assert "s" not in after["columns"]  # only analyzed columns carry stats
    finally:
        drop_table(spark, "abr_cbo_stats_t")

"""Spark 4 SQL-surface coverage beyond the catalog: session
variables, EXECUTE IMMEDIATE, SQL scripting (BEGIN...END), and
malformed-record quarantine on CSV/JSON scans.

These are engine surfaces a reference user would reach for that don't
produce an oracle-able row set on the shared tables — covered here as
direct behavioral tests instead of catalog queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from amazon_books_review_spark.sources.io import read_csv


def test_session_variables(spark):
    spark.sql("DECLARE OR REPLACE VARIABLE abr_cutoff INT DEFAULT 3")
    assert spark.sql("SELECT abr_cutoff AS v").collect()[0].v == 3
    spark.sql("SET VARIABLE abr_cutoff = 7")
    out = spark.sql(
        "SELECT count(*) AS n FROM range(10) WHERE id < abr_cutoff"
    ).collect()[0].n
    assert out == 7
    spark.sql("DROP TEMPORARY VARIABLE abr_cutoff")


def test_execute_immediate_with_params(spark):
    spark.sql("DECLARE OR REPLACE VARIABLE abr_stmt STRING")
    spark.sql(
        "SET VARIABLE abr_stmt = 'SELECT ? * 6 AS v'"
    )
    out = spark.sql("EXECUTE IMMEDIATE abr_stmt USING 7").collect()[0].v
    assert out == 42
    spark.sql("DROP TEMPORARY VARIABLE abr_stmt")


def test_sql_scripting_compound(spark):
    """BEGIN...END compound with a loop — Spark 4 SQL scripting."""
    try:
        rows = spark.sql(
            """
            BEGIN
              DECLARE total INT DEFAULT 0;
              DECLARE i INT DEFAULT 0;
              WHILE i < 5 DO
                SET total = total + i;
                SET i = i + 1;
              END WHILE;
              SELECT total;
            END
            """
        ).collect()
    except Exception as exc:  # pragma: no cover - version-gated surface
        pytest.skip(f"SQL scripting unavailable: {type(exc).__name__}")
    assert rows[0][0] == 10


def test_csv_malformed_quarantine(spark, tmp_path):
    """PERMISSIVE mode captures broken rows in a rescue column instead
    of failing the scan — the quarantine split every production ingest
    needs (good rows forward, bad rows to a dead-letter sink)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = tmp_path / "dirty.csv"
    p.write_text("id,qty\n1,10\n2,not_a_number\n3,30\nbroken_line_only\n")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("qty", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_csv(
        spark,
        str(p),
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and {r.id for r in good.collect()} == {1, 3}
        # both malformed shapes land in quarantine with raw text intact
        bad_rows = {r._corrupt_record for r in bad.collect()}
        assert bad_rows == {"2,not_a_number", "broken_line_only"}
    finally:
        df.unpersist()


def test_csv_dropmalformed(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    p = tmp_path / "dirty2.csv"
    p.write_text("id,qty\n1,10\nx,y\n3,30\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("qty", LongType())]
    )
    df = read_csv(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert [r.id for r in df.orderBy("id").collect()] == [1, 3]


def test_json_malformed_quarantine(spark, tmp_path):
    p = tmp_path / "dirty.jsonl"
    p.write_text('{"id": 1, "v": "a"}\n{broken json\n{"id": 2, "v": "b"}\n')
    # Spark refuses to filter on the rescue column alone without the
    # raw rows materialized (AnalysisException otherwise) — cache
    # first, the same discipline a quarantine split job needs anyway.
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()
    )
    try:
        assert "_corrupt_record" in df.columns
        assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
        assert df.filter(F.col("id").isNotNull()).count() == 2
    finally:
        df.unpersist()


def test_sql_sugar_surfaces(spark):
    """GROUP BY ALL / ORDER BY ALL / SELECT * EXCEPT / IDENTIFIER() —
    the Spark 4 SQL conveniences an engine-parity user expects; the
    IDENTIFIER clause is the injection-safe companion to the named
    parameter markers in `parameterized_order_rollup`."""
    spark.range(6).selectExpr("id", "id % 3 AS k", "id * 2 AS v").createOrReplaceTempView(
        "abr_sugar"
    )
    got = {
        (r.k, r[1])
        for r in spark.sql(
            "SELECT k, count(*) FROM abr_sugar GROUP BY ALL"
        ).collect()
    }
    assert got == {(0, 2), (1, 2), (2, 2)}
    ordered = spark.sql("SELECT k, id FROM abr_sugar ORDER BY ALL").collect()
    assert [(r.k, r.id) for r in ordered] == sorted((i % 3, i) for i in range(6))
    cols = spark.sql("SELECT * EXCEPT (v) FROM abr_sugar").columns
    assert cols == ["id", "k"]
    n = spark.sql(
        "SELECT count(*) AS n FROM IDENTIFIER(:tbl)", args={"tbl": "abr_sugar"}
    ).collect()[0].n
    assert n == 6
    spark.catalog.dropTempView("abr_sugar")

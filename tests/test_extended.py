"""Tests for the extended surface: stateful streaming sessionizer vs
the batch window sessionizer, and CSV source round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructType

from amazon_books_review_spark.plans.extended_queries import (
    sessionize_events,
    sessionize_events_stateful,
)
from amazon_books_review_spark.sources.io import read_csv, write_parquet

SF = "/root/testdata/sf0.001"


def test_stateful_sessionizer_matches_batch(spark):
    """Stream-batch equivalence for the custom stateful operator:
    applyInPandasWithState over a bounded drain == the window-function
    batch sessionizer."""
    batch = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start, r.duration_s)
        for r in sessionize_events(spark, SF).collect()
    }
    stateful = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start, r.duration_s)
        for r in sessionize_events_stateful(spark, SF).collect()
    }
    assert batch == stateful


def test_format_roundtrips(spark, tmp_path):
    """orc and json sinks/scans round-trip values and schema (json
    with explicit schema — row formats never infer at scale)."""
    from amazon_books_review_spark.sources.io import (
        load_table,
        read_table_format,
        write_table_format,
    )

    src = load_table(spark, SF, "nation")
    for fmt in ("orc", "json"):
        path = str(tmp_path / f"nation_{fmt}")
        write_table_format(src, path, fmt=fmt)
        back = read_table_format(
            spark, path, fmt=fmt,
            schema=src.schema if fmt == "json" else None,
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_source_explicit_schema(spark, tmp_path):
    """S1 — CSV scan with an explicit schema: no inference pass, types
    stable, garbage -> NULL under the engine's non-ANSI casts."""
    p = str(tmp_path / "books.csv")
    with open(p, "w") as f:
        f.write("title,year\nA,2001\nB,xx\n")
    schema = (
        StructType()
        .add("title", StringType())
        .add("year", IntegerType())
    )
    df = read_csv(spark, p, schema=schema)
    rows = {r.title: r.year for r in df.collect()}
    assert rows == {"A": 2001, "B": None}

    out = str(tmp_path / "books_parquet")
    write_parquet(df, out, partition_by=["year"])
    back = spark.read.parquet(out)
    assert back.count() == 2
    # partitioned layout -> partition pruning applies on year filters
    assert back.filter(F.col("year") == 2001).count() == 1


def test_threshold_alerts_matches_batch_rownumber(spark):
    """transformWithStateInPandas (state v2) end-to-end == the batch
    row_number formulation.  The v2 Python protocol needs protobuf,
    absent from this runtime — gated like the delta-spark tests."""
    import pytest

    pytest.importorskip("google.protobuf")
    import duckdb

    from amazon_books_review_spark.plans.extended_queries import (
        THRESHOLD_ALERTS_ORACLE,
        streaming_threshold_alerts,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in streaming_threshold_alerts(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(THRESHOLD_ALERTS_ORACLE).fetchall())
    assert got == want


def test_threshold_alerts_gate_raises_clearly(spark):
    """Without protobuf the operator must fail EAGERLY with an
    actionable ImportError, not crash mid-stream in a worker."""
    import pytest

    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present — the gate is open; see the e2e test")
    except ImportError:
        pass
    from amazon_books_review_spark.plans.extended_queries import (
        streaming_threshold_alerts,
    )

    with pytest.raises(ImportError, match="protobuf"):
        streaming_threshold_alerts(spark, "/root/testdata/sf0.001")

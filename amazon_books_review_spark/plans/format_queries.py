"""Driver-gated round-trips for the row/columnar interchange formats
the generic reader/writer pair supports beyond CSV and Parquet
(sources/io.read_table_format / write_table_format): JSONL — the de
facto interchange format for LLM training corpora — and ORC.

Same fixture discipline as plans/books_csv_queries.py: the write is
the fixture step over a deterministic derivation of a parquet test
table, the READ BACK is the operator under the hard gate, and the
DuckDB oracle recomputes the expected result from the original table —
so a wrong writer encoding, a wrong reader schema, or a lossy
round-trip all fail the value hash.
"""

from __future__ import annotations

from amazon_books_review_spark.sources import fixtures

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from amazon_books_review_spark.sources.io import (
    load_table,
    read_table_format,
    write_table_format,
)


def _fixture_path(tag: str, sf_dir: str) -> str:
    # PID suffix: idempotent within a process, race-free across
    # concurrent processes (see books_csv_queries._csv_roundtrip).
    # Swept at exit + stale-pid sweep on mint (sources.fixtures).
    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    return fixtures.pid_fixture_path("abr_fmt_", f"{tag}_{safe}")


#: Explicit read schema for the JSONL corpus — schema inference over
#: JSON is an extra full pass AND type-unstable (an all-int shard
#: infers long where another infers double); a corpus reader always
#: declares its record schema.
JSONL_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("lang", StringType()),
                    StructField("source", StringType()),
                    StructField("n_chars", LongType()),
                ]
            ),
        ),
        StructField("tags", ArrayType(StringType())),
        StructField("text", StringType()),
    ]
)


def jsonl_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus scan: documents re-shaped into the nested record
    layout training corpora ship as ({id, meta{...}, tags[], text}),
    written as JSON Lines, read back with the explicit schema, and
    flattened — nested-struct field access and array cardinality both
    under the value hash.

    Scale note: JSONL is a row format — no column pruning, no
    predicate pushdown — so a 100 TB pipeline reads it exactly once,
    at ingest, and converts to parquet (what the cleaning pipelines
    do); this query verifies that ingest read is lossless.
    """
    docs = load_table(spark, sf_dir, "documents")
    records = docs.select(
        F.col("doc_id").alias("id"),
        F.struct(
            F.col("lang"), F.col("source"), F.col("n_chars")
        ).alias("meta"),
        F.array(F.col("lang"), F.col("source")).alias("tags"),
        F.col("text"),
    )
    path = _fixture_path("jsonl", sf_dir)
    write_table_format(records, path, fmt="json", mode="overwrite")
    back = read_table_format(spark, path, fmt="json", schema=JSONL_SCHEMA)
    return back.select(
        F.col("id").alias("doc_id"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.col("meta.n_chars").alias("n_chars"),
        F.size("tags").alias("n_tags"),
        F.length("text").cast("long").alias("text_len"),
    )


JSONL_ROUNDTRIP_ORACLE = """
SELECT doc_id, lang, source, n_chars,
       CAST(2 AS INTEGER) AS n_tags,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
"""


def orc_lineitem_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scan with predicate pushdown: a lineitem projection is
    written as ORC, read back, filtered (the range predicate reaches
    the ORC reader as a pushed filter / search argument) and
    aggregated.  Oracle recomputes from the parquet original, so an
    encoding or pushdown-semantics difference between the two columnar
    formats fails the hash."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )
    path = _fixture_path("orc", sf_dir)
    write_table_format(li, path, fmt="orc", mode="overwrite")
    back = read_table_format(spark, path, fmt="orc")
    return (
        back.filter(F.col("l_quantity") >= 25)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


ORC_ROUNDTRIP_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity >= 25
GROUP BY l_returnflag
"""


FORMAT_QUERIES = [
    ("jsonl_corpus_roundtrip", jsonl_corpus_roundtrip, JSONL_ROUNDTRIP_ORACLE,
     "JSONL nested-record corpus scan (explicit schema) round-trip"),
    ("orc_lineitem_roundtrip", orc_lineitem_roundtrip, ORC_ROUNDTRIP_ORACLE,
     "ORC sink + pushed-filter scan round-trip aggregate"),
]

"""Driver-verifiable runs of the reference's own cleaning pipelines.

The two pipelines (``clean_books_details`` == BD:54-203,
``clean_books_ratings`` == BR:29-119, re-expressed in
plans/books_pipeline.py) were previously pytest-only: their input is a
raw CSV, which the driver's oracle harness cannot see (it registers
only the parquet test tables as DuckDB views).  These queries close
that gap (VERDICT r3 "do this" #4, the S1/P7 coverage hole):

1. synthesize a deterministic "dirty" raw frame from a parquet test
   table (every value derives from the table's keys, so the DuckDB
   oracle can recompute it exactly),
2. round-trip it through a real CSV file — write, then **read with the
   explicit raw schema** (S1, the reference's intended-but-unused
   declared schema, BD:39-49) so the CSV scan operator itself is under
   the driver gate,
3. run the full cleaning chain — including the BR:93 ``Price`` column
   drop (P7) and BD:153's explode cross-product — and return the
   cleaned frame.

Scale note: the CSV round-trip uses a driver-local temp dir sized by
the derived table; it exists to put the CSV *source operator* under
the hard gate.  A 100 TB deployment reads its real landing-zone CSVs
directly (sources/io.py:read_csv) — same reader, same schema
discipline, no temp hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_books_review_spark.sources import fixtures
from amazon_books_review_spark.plans.books_pipeline import (
    BOOK_DETAILS_RAW_SCHEMA,
    BOOKS_RATINGS_RAW_SCHEMA,
    clean_books_details,
    clean_books_ratings,
)
from amazon_books_review_spark.sources.io import load_table


def _csv_roundtrip(df: DataFrame, schema, tag: str, sf_dir: str) -> DataFrame:
    """Write ``df`` as a header CSV and read it back with ``schema``.

    The write is the fixture step; the *read* is the operator under
    test (S1: explicit-schema CSV scan).  A deterministic per-sf temp
    path keeps re-runs idempotent (mode=overwrite) without growing
    /tmp unboundedly across driver invocations.
    """
    spark = df.sparkSession
    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    # PID suffix: re-runs within a process stay idempotent (overwrite),
    # while concurrent processes (pytest alongside the driver) can't
    # race each other's overwrite-vs-lazy-read on a shared path.
    # Swept at exit + stale-pid sweep on mint (sources.fixtures).
    path = fixtures.pid_fixture_path("abr_csv_", f"{tag}_{safe}")
    # Parallel multi-part write — coalesce(1) serialized both the
    # derivation and the write onto one task (measured 1.9s vs 0.4s at
    # sf0.1) and a real landing zone is many files anyway; the reader
    # globs the directory and the chain/oracle are order-insensitive.
    df.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.csv(path, schema=schema, header=True)


def clean_books_ratings_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BR:29-119 end-to-end from a CSV scan (S1 + P7 + the full chain).

    Raw rows derive from ``orders``: helpfulness fractions with zero
    denominators and slashless garbage (BR:42-52 + BR:105 NULL->0),
    unparseable / missing scores (BR:67-69 cast + subset dropna),
    epoch-second strings (BR:76 from_unixtime), a throwaway ``Price``
    column (BR:86-93 drop), and NULL profile/text fields for the
    fillna defaults (BR:104-107).
    """
    ok = F.col("o_orderkey")
    ck = F.col("o_custkey")
    raw = load_table(spark, sf_dir, "orders").select(
        ok.cast("string").alias("Id"),
        F.concat(F.lit("Book_"), (ck % 97).cast("string")).alias("Title"),
        # 84%-null in the reference; dropped by the pipeline either way.
        F.when(ok % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("Price"),
        F.concat(F.lit("U"), ck.cast("string")).alias("User_id"),
        F.when(ok % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("profile_"), ck.cast("string")))
        .alias("profileName"),
        F.when(ok % 13 == 0, F.lit("unknown"))
        .otherwise(
            F.concat((ok % 7).cast("string"), F.lit("/"), (ok % 12).cast("string"))
        )
        .alias("review/helpfulness"),
        F.when(ok % 10 == 0, F.lit("bad"))
        .when(ok % 10 == 1, F.lit(None).cast("string"))
        .otherwise(((ok % 5) + 1).cast("string"))
        .alias("review/score"),
        ((ok % 20000) * 86400).cast("string").alias("review/time"),
        F.concat(F.lit("summary_"), ok.cast("string")).alias("review/summary"),
        F.when(ok % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("text_"), ok.cast("string")))
        .alias("review/text"),
    )
    csv = _csv_roundtrip(raw, BOOKS_RATINGS_RAW_SCHEMA, "ratings", sf_dir)
    return clean_books_ratings(csv)


CLEAN_RATINGS_CSV_ORACLE = """
WITH kept AS (
    SELECT o_orderkey AS ok, o_custkey AS ck
    FROM orders
    -- BR:67-69: rows whose score string fails the float cast are dropped
    WHERE o_orderkey % 10 NOT IN (0, 1)
)
SELECT CAST(ok AS VARCHAR) AS Id,
       'Book_' || CAST(ck % 97 AS VARCHAR) AS Title,
       'U' || CAST(ck AS VARCHAR) AS User_id,
       CASE WHEN ok % 11 = 0 THEN 'N.A'
            ELSE 'profile_' || CAST(ck AS VARCHAR) END AS profileName,
       -- BR:42-52: 'n/d' split, float casts, round(n/d*100, 2); 'unknown'
       -- and d=0 both yield NULL, mapped to 0 by fillna (BR:105).  Spark's
       -- Divide promotes float operands to double; mirror that cast.
       CASE WHEN ok % 13 = 0 OR ok % 12 = 0 THEN 0
            ELSE round(CAST(ok % 7 AS DOUBLE) / CAST(ok % 12 AS DOUBLE) * 100, 2)
       END AS Review_helpfulness,
       CAST((ok % 5) + 1 AS FLOAT) AS review_score,
       CAST(ok % 20000 AS BIGINT) * 86400 AS review_time_unix,
       strftime(make_timestamp(CAST(ok % 20000 AS BIGINT) * 86400 * 1000000),
                '%Y-%m-%d %H:%M:%S') AS review_Time,
       'summary_' || CAST(ok AS VARCHAR) AS review_summary,
       CASE WHEN ok % 17 = 0 THEN 'N.A'
            ELSE 'text_' || CAST(ok AS VARCHAR) END AS review_text
FROM kept
"""


def clean_books_details_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BD:54-203 end-to-end from a CSV scan (S1 + the full chain).

    Raw rows derive from ``part`` keyed on ``p_partkey % 1500`` so key
    collisions produce fully-duplicate raw rows (exercising BD:177
    dropDuplicates).  Stringified author/category lists (BD:68-86),
    garbage ratingsCounts (BD:99), unparseable publishedDates (BD:111
    LEGACY 'yyyy' -> NULL year -> BD:176 dropna), and ftp/NULL URLs
    (BD:128-142 startswith-or-null filters) cover every branch of the
    chain; BD:153's cross-product explode doubles rows (2 authors x 1
    category).
    """
    k = (F.col("p_partkey") % 1500).cast("long")
    raw = load_table(spark, sf_dir, "part").select(
        F.concat(F.lit("Book_"), k.cast("string")).alias("title"),
        F.concat(F.lit("desc_"), k.cast("string")).alias("description"),
        F.concat(
            F.lit("['Author_"),
            (k % 7).cast("string"),
            F.lit("', 'Author_"),
            (k % 5).cast("string"),
            F.lit("']"),
        ).alias("authors"),
        F.when(k % 19 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("http://img/"), k.cast("string")))
        .alias("image"),
        F.concat(F.lit("http://preview/"), k.cast("string")).alias("previewLink"),
        F.concat(F.lit("Publisher_"), (k % 13).cast("string")).alias("publisher"),
        F.when(k % 23 == 0, F.lit("unknown"))
        .otherwise((F.lit(1980) + k % 40).cast("string"))
        .alias("publishedDate"),
        F.when(k % 17 == 0, F.concat(F.lit("ftp://info/"), k.cast("string")))
        .otherwise(F.concat(F.lit("http://info/"), k.cast("string")))
        .alias("infoLink"),
        F.concat(F.lit("['Cat_"), (k % 11).cast("string"), F.lit("']")).alias(
            "categories"
        ),
        F.when(k % 29 == 0, F.lit("many"))
        .otherwise((k % 1000).cast("string"))
        .alias("ratingsCount"),
    )
    csv = _csv_roundtrip(raw, BOOK_DETAILS_RAW_SCHEMA, "details", sf_dir)
    return clean_books_details(csv)


CLEAN_DETAILS_CSV_ORACLE = """
WITH ks AS (
    -- duplicate raw rows (p_partkey collisions mod 1500) collapse under
    -- BD:177 dropDuplicates; BD:128-142 drops ftp infoLinks (k%17) and
    -- BD:176 dropna drops NULL publish years (k%23, LEGACY parse fail)
    SELECT DISTINCT p_partkey % 1500 AS k
    FROM part
    WHERE p_partkey % 1500 % 17 <> 0
      AND p_partkey % 1500 % 23 <> 0
)
SELECT 'Book_' || CAST(k AS VARCHAR) AS Title,
       'desc_' || CAST(k AS VARCHAR) AS description,
       -- BD:68-86: strip [ ]' then split on ',' — the second element
       -- keeps its leading space; BD:153 explode doubles the rows
       unnest(string_split(
           'Author_' || CAST(k % 7 AS VARCHAR) || ', Author_' || CAST(k % 5 AS VARCHAR),
           ',')) AS authors,
       CASE WHEN k % 19 = 0 THEN 'N.A'
            ELSE 'http://img/' || CAST(k AS VARCHAR) END AS image,
       'http://preview/' || CAST(k AS VARCHAR) AS previewLink,
       'Publisher_' || CAST(k % 13 AS VARCHAR) AS publisher,
       CAST(1980 + k % 40 AS VARCHAR) AS publishedDate,
       'http://info/' || CAST(k AS VARCHAR) AS infoLink,
       'Cat_' || CAST(k % 11 AS VARCHAR) AS categories,
       CAST(CASE WHEN k % 29 = 0 THEN 0 ELSE k % 1000 END AS FLOAT) AS Ratings_Count,
       CAST(1980 + k % 40 AS INTEGER) AS Year_of_publish
FROM ks
"""


BOOKS_CSV_QUERIES = [
    ("clean_books_ratings_csv", clean_books_ratings_csv, CLEAN_RATINGS_CSV_ORACLE,
     "S1+P7+BR:29-119: explicit-schema CSV scan through the full ratings chain"),
    ("clean_books_details_csv", clean_books_details_csv, CLEAN_DETAILS_CSV_ORACLE,
     "S1+BD:54-203: explicit-schema CSV scan through the full details chain"),
]

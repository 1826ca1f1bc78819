"""The reference's two cleaning pipelines, re-expressed as pure functions.

``clean_books_details``  == Amazon-book-review_books_details.py (BD) 54-203
``clean_books_ratings``  == Amazon-book-review_books_reviews.py (BR) 29-119

Both are DataFrame -> DataFrame (no I/O, no session mutation), so the
same functions run over batch reads and streaming reads unchanged —
the property the medallion plans (plans/medallion.py, streaming/) rely
on for stream-batch equivalence testing.

Fidelity decisions (SURVEY.md §7.5.2 — all pinned in session.py):
- non-ANSI casts: garbage -> NULL (BD:99, BR:47-48, BR:67)
- LEGACY time parser for to_date(.., "yyyy") (BD:111)
- from_unixtime returns a STRING wall-clock (BR:76)
- BD:153's double explode is written as sequential explodes (Spark
  rejects two generators in one select); semantics = the cross
  product the reference intended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DateType,
    FloatType,
    StringType,
    StructType,
)

from amazon_books_review_spark.operators import cleaning
from amazon_books_review_spark.functions import temporal

#: BD:39-49 — declared but never passed to the reader in the
#: reference; here it IS the csv read schema (strings for the listish
#: columns, since the raw files carry stringified lists).
BOOK_DETAILS_DECLARED_SCHEMA = (
    StructType()
    .add("title", StringType(), False)
    .add("description", StringType(), True)
    .add("authors", ArrayType(StringType()), True)
    .add("image", StringType(), True)
    .add("previewLink", StringType(), True)
    .add("publisher", StringType(), True)
    .add("publishedDate", DateType(), True)
    .add("infoLink", StringType())
    .add("categories", ArrayType(StringType()), True)
    .add("ratingsCount", FloatType(), True)
)

#: What the raw CSV actually contains (every column arrives as text;
#: the cleaning chain exists to repair exactly this).
BOOK_DETAILS_RAW_SCHEMA = (
    StructType()
    .add("title", StringType(), False)
    .add("description", StringType(), True)
    .add("authors", StringType(), True)
    .add("image", StringType(), True)
    .add("previewLink", StringType(), True)
    .add("publisher", StringType(), True)
    .add("publishedDate", StringType(), True)
    .add("infoLink", StringType(), True)
    .add("categories", StringType(), True)
    .add("ratingsCount", StringType(), True)
)

BOOKS_RATINGS_RAW_SCHEMA = (
    StructType()
    .add("Id", StringType(), True)
    .add("Title", StringType(), True)
    .add("Price", StringType(), True)
    .add("User_id", StringType(), True)
    .add("profileName", StringType(), True)
    .add("review/helpfulness", StringType(), True)
    .add("review/score", StringType(), True)
    .add("review/time", StringType(), True)
    .add("review/summary", StringType(), True)
    .add("review/text", StringType(), True)
)


def clean_books_details(raw: DataFrame, normalized: bool = False) -> DataFrame:
    """BD:54-203 as one pure transform.

    ``normalized=False`` (fidelity): exploded cross-product output,
    one row per (author x category) — row counts visibly match the
    reference.  ``normalized=True`` (scale mode): keeps authors /
    categories as arrays; at 100 TB the cross-product explode
    multiplies the fact table by |authors| x |categories| for no
    analytical gain (SURVEY.md §4.2.4) — explode into link tables on
    demand instead.
    """
    # BD:68-86 — strip [ ] ' from stringified lists, split to arrays.
    df = cleaning.strip_listish(raw, "authors", "categories")
    df = cleaning.split_to_array(df, "authors", ",")
    df = cleaning.split_to_array(df, "categories", ",")

    # BD:99 — float cast nulls out garbage counts.
    df = df.withColumn("Ratings_Count", F.col("ratingsCount").cast(FloatType()))

    # BD:111-113 — publication year via LEGACY "yyyy" parse.
    df = temporal.derive_publish_year(df, "publishedDate", "Year_of_publish")

    # BD:128-142 — URL sanity filters (collapse to one Filter node).
    df = cleaning.filter_url_like(df, "image", "previewLink", "infoLink")

    # BD:153 — the final projection (+ cross-product explode).
    cols = [
        F.col("title").alias("Title"),
        "description",
        "authors",
        "image",
        "previewLink",
        "publisher",
        "publishedDate",
        "infoLink",
        "categories",
        "Ratings_Count",
        "Year_of_publish",
    ]
    df = df.select(*cols)
    if not normalized:
        df = cleaning.explode_columns(df, "authors", "categories")

    # BD:167-177 — fillna dict, then dropna-all, then dropDuplicates.
    # (publishedDate stays a string column here, so "N.A" applies --
    # matching the inferred-schema reality of the reference run.)
    fill: dict[str, object] = {
        "Title": "N.A",
        "description": "N.A",
        "image": "N.A",
        "previewLink": "N.A",
        "publisher": "N.A",
        "infoLink": "N.A",
        "publishedDate": "N.A",
        "Ratings_Count": 0,
    }
    if not normalized:
        fill.update({"authors": "N.A", "categories": "N.A"})
    df = cleaning.fillna_defaults(df, fill)
    df = cleaning.drop_nulls(df)
    df = cleaning.dedup_rows(df)

    # BD:189-195 — strip backslashes and double quotes.
    if not normalized:
        df = cleaning.strip_escapes_and_quotes(df, "authors", "publisher", "categories")
    else:
        df = cleaning.strip_escapes_and_quotes(df, "publisher")
    return df


def clean_books_ratings(raw: DataFrame) -> DataFrame:
    """BR:29-119 as one pure transform."""
    # BR:42-52 — helpfulness fraction -> percentage.
    df = cleaning.split_fraction(raw, "review/helpfulness", "Reviews", "Helpfulness")
    df = cleaning.ratio_percent(df, "Reviews", "Helpfulness", "Review_helpfulness")

    # BR:67-69 — score float cast, drop unparseable.
    df = df.withColumn("review/score", F.col("review/score").cast(FloatType()))
    df = cleaning.drop_nulls(df, subset=["review/score"])

    # BR:76 — unix seconds -> wall-clock STRING (fidelity: string).
    df = temporal.unix_to_wallclock(df, "review/time", "review_Time")

    # BR:86-93 — drop the 84%-null Price column.
    df = df.drop("Price")

    # BR:102-107 — mean-impute the score, fill the rest.
    df = cleaning.impute_mean(df, ["review/score"])
    df = cleaning.fillna_defaults(
        df,
        {
            "Title": "N.A",
            "User_id": "N.A",
            "profileName": "N.A",
            "review/summary": "N.A",
            "review/text": "N.A",
            "Review_helpfulness": 0,
        },
    )

    # BR:113 — final projection + renames.
    return df.select(
        "Id",
        "Title",
        "User_id",
        "profileName",
        "Review_helpfulness",
        F.col("review/score").alias("review_score"),
        F.col("review/time").cast("long").alias("review_time_unix"),
        "review_Time",
        F.col("review/summary").alias("review_summary"),
        F.col("review/text").alias("review_text"),
    )


def silver_books_reviews(
    details: DataFrame,
    reviews: DataFrame,
    fidelity: bool = True,
    salts: int | None = None,
) -> DataFrame:
    """MA:116-121 — the silver join, batch or streaming input alike.

    fidelity=True reproduces the reference predicate
    ``YEAR(review_Time) > 2010`` (function-wrapped column: no pushdown)
    and ``YEAR(to_date(Year_of_publish))`` re-derivation (needs LEGACY
    parser).  fidelity=False uses the range predicate and trusts the
    already-int year — the plan a 100 TB deployment wants.

    ``salts`` hardens the join against hot-``Title`` skew (SURVEY
    §4.2 #3): the review side scatters over ``salts`` sub-keys via a
    deterministic per-row hash (replay-safe — ``rand()`` would re-roll
    on retry), the details side replicates to every salt, and the key
    becomes (Title, salt).  Streamed inputs: the hot title's join
    state spreads over ``salts`` state-store partitions, which AQE
    cannot do for stateful streaming.  Result set is row-identical to
    the unsalted join (pytest-pinned).
    """
    if salts is not None:
        # salt BEFORE aliasing so the alias survives onto the join plan
        reviews = reviews.withColumn(
            "_salt",
            F.pmod(F.hash("User_id", "review_Time", "Title"), F.lit(salts)),
        )
        details = details.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
        )
    d = details.alias("a")
    r = reviews.alias("b")
    cond = F.col("a.Title") == F.col("b.Title")
    if salts is not None:
        cond = cond & (F.col("a._salt") == F.col("b._salt"))
    joined = r.join(d, cond, "inner")

    if fidelity:
        year_col = F.year(F.to_date(F.col("a.Year_of_publish").cast("string"), "yyyy"))
        pred = F.year(F.col("b.review_Time")) > 2010
    else:
        year_col = F.col("a.Year_of_publish")
        pred = F.col("b.review_Time") >= F.lit("2011-01-01")

    return joined.filter(pred).select(
        F.col("b.Title").alias("Title"),
        F.col("a.authors").alias("authors"),
        F.col("a.publisher").alias("publisher"),
        year_col.alias("Year_of_publish"),
        F.col("a.categories").alias("categories"),
        F.col("a.Ratings_Count").alias("Ratings_Count"),
        F.col("b.User_id").alias("User_id"),
        F.col("b.profileName").alias("profileName"),
        F.col("b.Review_helpfulness").alias("Review_helpfulness"),
        F.col("b.review_score").alias("review_score"),
        F.col("b.review_Time").alias("review_Time"),
    )


def gold_users_count(silver: DataFrame) -> DataFrame:
    """MA:162-166 — ``COUNT(user_id) GROUP BY title, year, categories``."""
    return silver.groupBy("Title", "Year_of_publish", "categories").agg(
        F.count("User_id").alias("users_count")
    )

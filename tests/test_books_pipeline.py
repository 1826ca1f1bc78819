"""Golden tests for the books cleaning pipelines + batch medallion.

Each assertion names the reference behavior it locks (BD/BR/MA
file:line per SURVEY.md §2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_books_review_spark.plans.books_pipeline import (
    clean_books_details,
    clean_books_ratings,
    gold_users_count,
    silver_books_reviews,
)
from tests.fixtures import details_df, ratings_df


@pytest.fixture(scope="module")
def cleaned_details(spark):
    return clean_books_details(details_df(spark)).cache()


@pytest.fixture(scope="module")
def cleaned_ratings(spark):
    return clean_books_ratings(ratings_df(spark)).cache()


class TestCleanBooksDetails:
    def test_bad_url_dropped_null_kept(self, cleaned_details):
        titles = {r.Title for r in cleaned_details.select("Title").collect()}
        assert "Bad Image" not in titles  # BD:128 startswith filter
        assert "Null Image" in titles  # NULL url kept (isNull branch)

    def test_double_explode_cross_product(self, cleaned_details):
        rows = cleaned_details.filter(F.col("Title") == "Spark Basics").collect()
        # 2 authors x 2 categories = 4 rows (BD:153 intended semantics)
        assert len(rows) == 4
        pairs = {(r.authors.strip(), r.categories.strip()) for r in rows}
        assert pairs == {
            ("Ann Lee", "Tech"), ("Ann Lee", "Data"),
            ("Bob Ray", "Tech"), ("Bob Ray", "Data"),
        }

    def test_year_parsing_mixed_formats(self, cleaned_details):
        years = {
            r.Title: r.Year_of_publish
            for r in cleaned_details.select("Title", "Year_of_publish").collect()
        }
        assert years["Spark Basics"] == 2003  # full date under LEGACY
        assert years["Old Tome"] == 1999  # bare-year string (BD:113)
        assert "No Year" not in years  # garbage date -> NULL -> dropna (BD:176)

    def test_garbage_ratings_count_filled_zero(self, cleaned_details):
        row = cleaned_details.filter(F.col("Title") == "Odd Counts").first()
        assert row.Ratings_Count == 0.0  # cast->NULL (BD:99) + fillna 0 (BD:167)
        assert row.description == "N.A"  # fillna string default

    def test_duplicates_dropped(self, cleaned_details):
        assert cleaned_details.filter(F.col("Title") == "Dup Row").count() == 1

    def test_escape_and_quote_stripping(self, cleaned_details):
        row = cleaned_details.filter(F.col("Title") == "Escapes").first()
        assert "\\" not in row.authors and '"' not in row.authors  # BD:189
        assert "\\" not in row.publisher and '"' not in row.publisher  # BD:192
        assert "\\" not in row.categories and '"' not in row.categories  # BD:195

    def test_normalized_mode_keeps_arrays(self, spark):
        norm = clean_books_details(details_df(spark), normalized=True)
        row = norm.filter(F.col("Title") == "Spark Basics").first()
        assert sorted(a.strip() for a in row.authors) == ["Ann Lee", "Bob Ray"]
        assert norm.filter(F.col("Title") == "Spark Basics").count() == 1


class TestCleanBooksRatings:
    def test_helpfulness_percentage(self, cleaned_ratings):
        vals = {r.Id: r.Review_helpfulness for r in cleaned_ratings.collect()}
        assert vals["B1"] == 70.0  # 7/10 (BR:42-52)
        assert vals["B2"] == 0.0  # 0/0 -> NULL -> fillna 0 (BR:105)
        assert vals["B3"] == 0.0  # "n/a" -> cast NULL -> NULL ratio -> 0
        assert vals["B8"] == 62.5  # 5/8

    def test_unparseable_score_dropped(self, cleaned_ratings):
        ids = {r.Id for r in cleaned_ratings.collect()}
        assert "B4" not in ids  # cast->NULL + dropna subset (BR:67-69)
        assert "B5" not in ids  # NULL score dropped before imputation

    def test_unix_time_to_wallclock_string(self, cleaned_ratings):
        row = cleaned_ratings.filter(F.col("Id") == "B1").first()
        assert row.review_Time == "2014-05-13 16:53:20"  # UTC (BR:76)
        assert isinstance(row.review_Time, str)  # from_unixtime -> STRING
        assert row.review_time_unix == 1400000000

    def test_price_dropped_and_null_fills(self, cleaned_ratings):
        assert "Price" not in cleaned_ratings.columns  # BR:93
        row = cleaned_ratings.filter(F.col("Id") == "B8").first()
        assert row.User_id == "N.A" and row.profileName == "N.A"
        assert row.review_summary == "N.A" and row.review_text == "N.A"

    def test_output_schema(self, cleaned_ratings):
        assert cleaned_ratings.columns == [
            "Id", "Title", "User_id", "profileName", "Review_helpfulness",
            "review_score", "review_time_unix", "review_Time",
            "review_summary", "review_text",
        ]


class TestMedallionBatch:
    def test_silver_join_and_year_filter(self, cleaned_details, cleaned_ratings):
        silver = silver_books_reviews(cleaned_details, cleaned_ratings)
        rows = silver.collect()
        titles = {r.Title for r in rows}
        assert "Ghost Book" not in titles  # inner join (MA:119-120)
        assert "Pre2011 Only" not in titles  # YEAR(review_Time) > 2010 (MA:121)
        assert {"Spark Basics", "Old Tome", "Null Image"} <= titles
        assert silver.columns == [
            "Title", "authors", "publisher", "Year_of_publish", "categories",
            "Ratings_Count", "User_id", "profileName", "Review_helpfulness",
            "review_score", "review_Time",
        ]
        # Year re-derivation YEAR(to_date(int)) survives LEGACY parser (MA:117)
        years = {r.Title: r.Year_of_publish for r in rows}
        assert years["Old Tome"] == 1999

    def test_silver_fidelity_vs_improved_equivalence(
        self, cleaned_details, cleaned_ratings
    ):
        fid = silver_books_reviews(cleaned_details, cleaned_ratings, fidelity=True)
        imp = silver_books_reviews(cleaned_details, cleaned_ratings, fidelity=False)
        assert sorted(map(tuple, fid.collect())) == sorted(map(tuple, imp.collect()))

    def test_gold_users_count(self, cleaned_details, cleaned_ratings):
        silver = silver_books_reviews(cleaned_details, cleaned_ratings)
        gold = gold_users_count(silver)
        # Spark Basics: 3 post-2010 reviews x 4 exploded (author x cat)
        # detail rows = 12 silver rows; grouping by (Title, year,
        # categories) collapses the 2 authors -> 2 gold rows (Tech,
        # Data) with 2 authors x 3 reviews = 6 user occurrences each.
        rows = gold.filter(F.col("Title") == "Spark Basics").collect()
        assert len(rows) == 2
        assert all(r.users_count == 6 for r in rows)
        assert gold.columns == ["Title", "Year_of_publish", "categories", "users_count"]

"""Book-shaped fixture rows (FIXTURES.md §A) for pipeline golden tests.

Hand-written rows, each exercising a specific cleaning op; comments
name the op so test failures read back to SURVEY.md §2.
"""

from __future__ import annotations

# (title, description, authors, image, previewLink, publisher,
#  publishedDate, infoLink, categories, ratingsCount)
BOOK_DETAILS_ROWS = [
    # plain happy row, multi-author x multi-category (explode cross product)
    ("Spark Basics", "intro", "['Ann Lee', 'Bob Ray']", "http://img/1",
     "http://prev/1", "OReilly", "2003-05-17", "http://info/1",
     "['Tech', 'Data']", "120"),
    # year-only date (LEGACY to_date 'yyyy'), single author/category
    ("Old Tome", "classic", "['Cass Doe']", "http://img/2", "http://prev/2",
     "Penguin", "1999", "http://info/2", "['History']", "55"),
    # garbage ratingsCount -> NULL -> fillna 0; NULL description -> "N.A"
    ("Odd Counts", None, "['Dee Fox']", "http://img/3", "http://prev/3",
     "Minor", "2015-01-01", "http://info/3", "['Tech']", "abc"),
    # bad image URL -> row dropped by the URL filter
    ("Bad Image", "x", "['Eve Woo']", "not-a-url", "http://prev/4",
     "Pub", "2012", "http://info/4", "['Tech']", "10"),
    # NULL image is KEPT (startswith OR isNull)
    ("Null Image", "y", "['Fay Qin']", None, "http://prev/5",
     "Pub", "2012", "http://info/5", "['Data']", "10"),
    # backslash + quote junk cleaned by the final regexp pass
    ('Escapes', "z", "['G\\\\Hart \"GH\"']", "http://img/6", "http://prev/6",
     'Pub\\"X', "2018", "http://info/6", "['Sci\\\\Fi']", "7"),
    # garbage publishedDate -> NULL year -> row dropped by dropna()
    ("No Year", "w", "['Hal Oda']", "http://img/7", "http://prev/7",
     "Pub", "?", "http://info/7", "['Tech']", "3"),
    # exact duplicate pair -> dropDuplicates keeps one
    ("Dup Row", "d", "['Ivy Joy']", "http://img/8", "http://prev/8",
     "Pub", "2014", "http://info/8", "['Data']", "9"),
    ("Dup Row", "d", "['Ivy Joy']", "http://img/8", "http://prev/8",
     "Pub", "2014", "http://info/8", "['Data']", "9"),
    # title with reviews BEFORE 2011 only (silver filter drops them)
    ("Pre2011 Only", "p", "['Kim Sun']", "http://img/9", "http://prev/9",
     "Pub", "2008", "http://info/9", "['Tech']", "22"),
]

# (Id, Title, Price, User_id, profileName, review/helpfulness,
#  review/score, review/time, review/summary, review/text)
# 2011-01-01 UTC = 1293840000; 2010-06-01 = 1275350400
BOOKS_RATINGS_ROWS = [
    # happy rows, post-2010 (silver keeps)
    ("B1", "Spark Basics", None, "U1", "alice", "7/10", "4.0",
     "1400000000", "good", "liked it"),
    ("B2", "Spark Basics", None, "U2", "bob", "0/0", "5.0",
     "1410000000", "great", "loved it"),          # 0/0 -> NULL -> 0
    ("B3", "Old Tome", None, "U3", "carol", "n/a", "3.0",
     "1420000000", "ok", "fine"),                 # garbage fraction -> NULL -> 0
    # unparseable score -> dropna(subset=review/score) removes row
    ("B4", "Old Tome", None, "U4", "dan", "1/2", "bad",
     "1430000000", "?", "?"),
    # NULL score -> dropped by the same dropna (before imputation,
    # matching the reference order BR:69 then BR:102)
    ("B5", "Odd Counts", None, "U5", "erin", "3/4", None,
     "1440000000", "hm", "hm"),
    # pre-2011 review -> silver filter drops it
    ("B6", "Pre2011 Only", "9.99", "U6", "finn", "2/5", "2.0",
     "1275350400", "meh", "old"),
    # review of a title ABSENT from details -> inner join drops
    ("B7", "Ghost Book", None, "U7", "gale", "1/1", "4.0",
     "1450000000", "?", "?"),
    # NULL user/profile/summary/text -> fillna "N.A"
    ("B8", "Null Image", None, None, None, "5/8", "1.0",
     "1460000000", None, None),
    # second post-2010 review for gold users_count > 1
    ("B9", "Spark Basics", None, "U9", "hana", "9/10", "4.5",
     "1470000000", "nice", "good read"),
]


def details_df(spark):
    from amazon_books_review_spark.plans.books_pipeline import BOOK_DETAILS_RAW_SCHEMA

    return spark.createDataFrame(BOOK_DETAILS_ROWS, BOOK_DETAILS_RAW_SCHEMA)


def ratings_df(spark):
    from amazon_books_review_spark.plans.books_pipeline import BOOKS_RATINGS_RAW_SCHEMA

    return spark.createDataFrame(BOOKS_RATINGS_ROWS, BOOKS_RATINGS_RAW_SCHEMA)

"""Reference-surface catalog queries (SURVEY.md §2) on the driver testdata.

Each function implements one (or one tight cluster) of the reference's
operator inventory rows on the TPC-H-ish tables, with a DuckDB oracle
string right next to it.  Column names/types are aligned on both
sides; every computed column is explicitly aliased (driver compares
with columns sorted by name).

The Spark side composes the engine's operator library
(operators/cleaning.py, functions/temporal.py) — these queries double
as integration tests of those modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_books_review_spark.operators import cleaning
from amazon_books_review_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL as _FLAGSHIP_ORACLE,
)
from amazon_books_review_spark.sources.io import load_table


# ---------------------------------------------------------------------------
# F1/F2/F10 — stringified-list cleaning (BD:68-86 shape)
# ---------------------------------------------------------------------------


def clean_listish_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a stringified list "['Brand#x', 'TYPE']" from part columns,
    then run the reference's cleaning chain: strip [ ] ' chars (F1),
    split to array (F2), take elements (BD:68-86, BR:42-43)."""
    part = load_table(spark, sf_dir, "part")
    df = part.withColumn(
        "listish",
        F.concat(F.lit("['"), F.col("p_brand"), F.lit("', '"), F.col("p_type"), F.lit("']")),
    )
    df = cleaning.strip_listish(df, "listish")
    df = df.withColumn("parts", F.split(F.col("listish"), ", "))
    return df.select(
        F.col("p_partkey"),
        F.col("listish").alias("cleaned"),
        F.col("parts").getItem(0).alias("first_elem"),
        F.col("parts").getItem(1).alias("second_elem"),
        F.size("parts").cast("long").alias("n_elems"),
    )


CLEAN_LISTISH_ORACLE = r"""
WITH src AS (
    SELECT p_partkey,
           regexp_replace('[''' || p_brand || ''', ''' || p_type || ''']',
                          '[\[\]'']', '', 'g') AS cleaned
    FROM part
)
SELECT p_partkey,
       cleaned,
       string_split(cleaned, ', ')[1] AS first_elem,
       string_split(cleaned, ', ')[2] AS second_elem,
       CAST(len(string_split(cleaned, ', ')) AS BIGINT) AS n_elems
FROM src
"""


# ---------------------------------------------------------------------------
# F3 — double-explode cross-product (BD:153 intended semantics)
# ---------------------------------------------------------------------------


def explode_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two array columns exploded per row -> |a| x |b| output rows.

    The reference writes both explodes in one select (BD:153), which
    Spark rejects; the intended cross-product comes from sequential
    explodes (operators.cleaning.explode_columns).
    """
    part = load_table(spark, sf_dir, "part")
    df = part.withColumn("name_words", F.split(F.col("p_name"), " ")).withColumn(
        "attrs", F.array(F.col("p_brand"), F.col("p_type"))
    )
    df = cleaning.explode_columns(df, "name_words", "attrs")
    return df.select(
        F.col("p_partkey"),
        F.col("name_words").alias("name_word"),
        F.col("attrs").alias("attr"),
    )


EXPLODE_CROSS_ORACLE = """
SELECT p_partkey,
       u1.name_word AS name_word,
       u2.attr AS attr
FROM part,
     unnest(string_split(p_name, ' ')) AS u1(name_word),
     unnest([p_brand, p_type]) AS u2(attr)
"""


# ---------------------------------------------------------------------------
# P4/F10/F11 — prefix-or-null validity filter (BD:128/135/142 shape)
# ---------------------------------------------------------------------------


def filter_prefix_or_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-inject p_type (making some rows NULL, like bad URL cells),
    then keep rows where the column startswith a prefix OR is NULL —
    the reference's URL sanity filter."""
    part = load_table(spark, sf_dir, "part")
    df = part.withColumn(
        "maybe_type", F.nullif(F.col("p_type"), F.lit("LARGE"))
    )
    df = cleaning.filter_url_like(df, "maybe_type", prefix="P")
    return df.select("p_partkey", "p_name", "maybe_type")


FILTER_PREFIX_ORACLE = """
WITH src AS (
    SELECT p_partkey, p_name, nullif(p_type, 'LARGE') AS maybe_type
    FROM part
)
SELECT p_partkey, p_name, maybe_type
FROM src
WHERE maybe_type LIKE 'P%' OR maybe_type IS NULL
"""


# ---------------------------------------------------------------------------
# F4 — cast-invalid-to-NULL (BD:99, BR:67 shape)
# ---------------------------------------------------------------------------


def cast_garbage_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed numeric/garbage strings -> float, garbage becoming NULL
    (non-ANSI cast semantics the whole reference relies on)."""
    events = load_table(spark, sf_dir, "events")
    df = events.withColumn(
        "raw_value",
        F.when(F.col("event_type") == "error", F.lit("garbage")).otherwise(
            F.col("value").cast("string")
        ),
    )
    df = cleaning.cast_invalid_to_null(df, {"raw_value": "double"})
    return df.select(
        F.col("event_id"),
        F.col("raw_value").alias("parsed_value"),
        F.col("raw_value").isNull().alias("is_bad"),
    )


CAST_GARBAGE_ORACLE = """
WITH src AS (
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'garbage'
                ELSE CAST(value AS VARCHAR) END AS raw_value
    FROM events
)
SELECT event_id,
       TRY_CAST(raw_value AS DOUBLE) AS parsed_value,
       TRY_CAST(raw_value AS DOUBLE) IS NULL AS is_bad
FROM src
"""


# ---------------------------------------------------------------------------
# F2/F8/F9/F12 — fraction -> ratio percent (BR:42-52 + BR:105)
# ---------------------------------------------------------------------------


def helpfulness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BR helpfulness chain on synthetic fractions: build
    "n/d" strings from lineitem ints, split on '/', float-cast both
    sides, round(n/d*100, 2), NULL (from d=0) -> 0 via fillna."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.withColumn(
        "frac",
        F.concat(
            F.col("l_linenumber").cast("string"),
            F.lit("/"),
            # l_suppkey mod 4 gives some zero denominators -> the
            # reference's "0/0 -> NULL -> 0" path (BR:105).
            (F.col("l_suppkey") % 4).cast("string"),
        ),
    )
    df = cleaning.split_fraction(df, "frac", "num_part", "den_part")
    df = cleaning.ratio_percent(df, "num_part", "den_part", "ratio_pct")
    df = cleaning.fillna_defaults(df, {"ratio_pct": 0})
    return df.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.col("frac"),
        F.col("ratio_pct"),
    )


HELPFULNESS_RATIO_ORACLE = """
WITH src AS (
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_no,
           CAST(l_linenumber AS VARCHAR) || '/' ||
           CAST(l_suppkey % 4 AS VARCHAR) AS frac
    FROM lineitem
), parts AS (
    SELECT l_orderkey, line_no, frac,
           TRY_CAST(string_split(frac, '/')[1] AS FLOAT) AS num_part,
           TRY_CAST(string_split(frac, '/')[2] AS FLOAT) AS den_part
    FROM src
)
SELECT l_orderkey, line_no, frac,
       -- Spark's Divide promotes float operands to double; mirror that,
       -- else DuckDB stays in float32 and round() keeps float noise.
       COALESCE(round(CAST(num_part AS DOUBLE) / CAST(den_part AS DOUBLE) * 100, 2), 0)
           AS ratio_pct
FROM parts
"""


# ---------------------------------------------------------------------------
# F5/F6/F7 — temporal round-trips (BD:113, BR:76, MA:117/121)
# ---------------------------------------------------------------------------


def temporal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year(), to_date("yyyy") under LEGACY parser, from_unixtime —
    the reference's complete temporal surface, UTC-pinned."""
    events = load_table(spark, sf_dir, "events")
    df = (
        events.withColumn("year_str", F.date_format("ts", "yyyy"))
        .withColumn("epoch_s", F.unix_timestamp(F.col("ts")))
        .withColumn("wallclock", F.from_unixtime(F.col("epoch_s")))
        .withColumn("year_date", F.to_date(F.col("year_str"), "yyyy"))
    )
    return df.select(
        F.col("event_id"),
        F.year("ts").cast("long").alias("event_year"),
        F.col("year_str"),
        # DateType rendered as ISO string: engines disagree on the
        # in-memory representation of DATE (date vs ns-timestamp);
        # the ISO string is unambiguous for the value-hash compare.
        F.date_format("year_date", "yyyy-MM-dd").alias("year_date"),
        F.col("epoch_s"),
        F.col("wallclock"),
    )


TEMPORAL_ORACLE = """
SELECT event_id,
       year(ts) AS event_year,
       strftime(ts, '%Y') AS year_str,
       strftime(CAST(strptime(strftime(ts, '%Y'), '%Y') AS DATE), '%Y-%m-%d') AS year_date,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
       strftime(make_timestamp(CAST(epoch(date_trunc('second', ts)) AS BIGINT) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS wallclock
FROM events
"""


# ---------------------------------------------------------------------------
# F12/F13/A2 — fillna / dropna / one-pass mean imputation (BR:102-107)
# ---------------------------------------------------------------------------


def impute_and_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-inject c_acctbal, impute the column mean (rounded to 2dp
    for cross-engine determinism), fill string nulls with "N.A"
    (BD:167), and drop rows whose name became NULL (BR:69 subset
    dropna shape)."""
    cust = load_table(spark, sf_dir, "customer")
    df = cust.withColumns(
        {
            "acctbal_holey": F.when(
                F.col("c_custkey") % 10 == 0, F.lit(None).cast("double")
            ).otherwise(F.col("c_acctbal")),
            "segment_holey": F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
        }
    )
    df = cleaning.impute_mean(df, ["acctbal_holey"], decimals=2)
    df = cleaning.fillna_defaults(df, {"segment_holey": "N.A"})
    return df.select(
        "c_custkey",
        F.col("acctbal_holey").alias("acctbal_filled"),
        F.col("segment_holey").alias("segment_filled"),
    )


IMPUTE_FILL_ORACLE = """
WITH holey AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS acctbal_holey,
           nullif(c_mktsegment, 'BUILDING') AS segment_holey
    FROM customer
), stats AS (
    SELECT round(CAST(sum(CAST(acctbal_holey AS DECIMAL(18,2))) AS DOUBLE)
                 / count(acctbal_holey), 2) AS mean_bal
    FROM holey
)
SELECT c_custkey,
       COALESCE(acctbal_holey, (SELECT mean_bal FROM stats)) AS acctbal_filled,
       COALESCE(segment_holey, 'N.A') AS segment_filled
FROM holey
"""


# ---------------------------------------------------------------------------
# A4 — dropDuplicates (BD:177)
# ---------------------------------------------------------------------------


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dropDuplicates projected to the key columns — equivalent
    to SELECT DISTINCT on those columns and deterministic across
    engines (full-row dropDuplicates keeps an arbitrary row per key)."""
    orders = load_table(spark, sf_dir, "orders")
    return cleaning.dedup_rows(
        orders.select("o_orderstatus", "o_orderpriority")
    )


DISTINCT_ORACLE = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


# ---------------------------------------------------------------------------
# A3 + P5 — counts and null predicates (BR:86-93)
# ---------------------------------------------------------------------------


def null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BR:86 "how null is this column" audit, one row per column,
    computed in ONE pass (the reference runs a job per probe)."""
    events = load_table(spark, sf_dir, "events")
    holey = events.withColumn(
        "maybe_props", F.nullif(F.col("event_type"), F.lit("error"))
    )
    return holey.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("maybe_props").isNull().cast("long")).alias("n_null"),
        F.round(
            F.sum(F.col("maybe_props").isNull().cast("long"))
            / F.count(F.lit(1))
            * 100,
            2,
        ).alias("null_pct"),
    )


NULL_AUDIT_ORACLE = """
WITH holey AS (
    SELECT nullif(event_type, 'error') AS maybe_props FROM events
)
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN maybe_props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       round(sum(CASE WHEN maybe_props IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*) * 100, 2) AS null_pct
FROM holey
"""


# ---------------------------------------------------------------------------
# Scalar-function breadth: string / math / conditional showcase
# ---------------------------------------------------------------------------


def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One projection exercising the wider scalar surface a reference
    user expects from a complete engine: case transforms, trim/pad,
    substring/locate, translate, repeat/reverse, abs/ceil/floor/
    pow/sqrt/exp/log10/sign/mod, CASE/coalesce/nullif/greatest/least.
    All Catalyst built-ins — one codegen'd map stage, no shuffle."""
    part = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.lpad(F.col("p_type"), 10, "_")).alias("type_padded"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.locate("o", F.col("p_name")).cast("long").alias("first_o"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels_upper"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("x"), F.col("p_size")).alias("size_bar"),
        F.abs(price - 1000).alias("price_dist_1000"),
        F.ceil(price).cast("long").alias("price_ceil"),
        F.floor(price).cast("long").alias("price_floor"),
        F.round(F.pow(F.col("p_size").cast("double"), 2), 4).alias("size_sq"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log10(price + 1), 6).alias("price_log10"),
        F.signum(price - 1000).alias("price_sign"),
        (F.col("p_size") % 5).cast("long").alias("size_mod5"),
        F.when(price > 1500, "premium")
        .when(price > 800, "standard")
        .otherwise("budget")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("ECONOMY")), F.lit("DEFAULT")).alias(
            "type_or_default"
        ),
        F.greatest(F.col("p_size"), F.lit(10)).cast("long").alias("size_floor10"),
        F.least(F.col("p_size"), F.lit(40)).cast("long").alias("size_cap40"),
    )


SCALAR_SHOWCASE_ORACLE = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       trim(lpad(p_type, 10, '_')) AS type_padded,
       substring(p_name, 1, 4) AS name_prefix,
       CAST(strpos(p_name, 'o') AS BIGINT) AS first_o,
       translate(p_name, 'aeiou', 'AEIOU') AS name_vowels_upper,
       reverse(p_brand) AS brand_rev,
       repeat('x', p_size) AS size_bar,
       abs(p_retailprice - 1000) AS price_dist_1000,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       round(pow(CAST(p_size AS DOUBLE), 2), 4) AS size_sq,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       round(log10(p_retailprice + 1), 6) AS price_log10,
       CAST(sign(p_retailprice - 1000) AS DOUBLE) AS price_sign,
       CAST(p_size % 5 AS BIGINT) AS size_mod5,
       CASE WHEN p_retailprice > 1500 THEN 'premium'
            WHEN p_retailprice > 800 THEN 'standard'
            ELSE 'budget' END AS tier,
       coalesce(nullif(p_type, 'ECONOMY'), 'DEFAULT') AS type_or_default,
       CAST(greatest(p_size, 10) AS BIGINT) AS size_floor10,
       CAST(least(p_size, 40) AS BIGINT) AS size_cap40
FROM part
"""


# ---------------------------------------------------------------------------
# Catalog-persistent tables (C1-C4 beyond temp views)
# ---------------------------------------------------------------------------


def catalog_persisted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C4 — ``saveAsTable`` -> ``spark.table`` round-trip, the
    reference's metastore idiom (MA:39 persist, MA:99-101 read-back,
    MA:88 DESCRIBE EXTENDED is pytest-locked in
    tests/test_table_catalog.py).  Persists the flagship gold rollup
    as a managed parquet table and returns the catalog read — same
    rows as flagship_gold_rollup, so it shares that oracle.
    Overwrite mode keeps re-runs idempotent (the reference's
    ``.table(...)`` sinks fail on re-run)."""
    from amazon_books_review_spark.plans.flagship import flagship_gold_rollup
    from amazon_books_review_spark.sources import table_catalog

    gold = flagship_gold_rollup(spark, sf_dir)
    table_catalog.save_as_table(gold, "abr_gold_rollup_persisted")
    return table_catalog.read_table(spark, "abr_gold_rollup_persisted")


# ---------------------------------------------------------------------------
# Registry table: (name, fn, oracle, doc)
# ---------------------------------------------------------------------------

REFERENCE_QUERIES = [
    ("clean_listish_strings", clean_listish_strings, CLEAN_LISTISH_ORACLE,
     "F1+F2: strip [ ]' chars, split to array, element access (BD:68-86)"),
    ("explode_cross_product", explode_cross_product, EXPLODE_CROSS_ORACLE,
     "F3: double-explode cross-product semantics (BD:153)"),
    ("filter_prefix_or_null", filter_prefix_or_null, FILTER_PREFIX_ORACLE,
     "P4/F10/F11: startswith-or-null validity filter (BD:128-142)"),
    ("cast_garbage_to_null", cast_garbage_to_null, CAST_GARBAGE_ORACLE,
     "F4: cast invalid -> NULL (BD:99, BR:67)"),
    ("helpfulness_ratio", helpfulness_ratio, HELPFULNESS_RATIO_ORACLE,
     "F2/F8/F9/F12: fraction split -> percent -> fillna 0 (BR:42-52,105)"),
    ("temporal_roundtrip", temporal_roundtrip, TEMPORAL_ORACLE,
     "F5/F6/F7: year, to_date('yyyy') LEGACY, from_unixtime (BD:113, BR:76)"),
    ("impute_and_fill", impute_and_fill, IMPUTE_FILL_ORACLE,
     "F12/F13/A2: mean imputation + fillna defaults (BR:102-107, BD:167)"),
    ("distinct_rows", distinct_rows, DISTINCT_ORACLE,
     "A4: dropDuplicates (BD:177)"),
    ("null_audit", null_audit, NULL_AUDIT_ORACLE,
     "A3/P5: null-count audit in one pass (BR:86)"),
    ("scalar_functions_showcase", scalar_functions_showcase, SCALAR_SHOWCASE_ORACLE,
     "string/math/conditional scalar breadth in one codegen'd projection"),
    ("catalog_persisted_rollup", catalog_persisted_rollup, _FLAGSHIP_ORACLE,
     "C1-C4: saveAsTable -> spark.table metastore round-trip (MA:39/99)"),
]

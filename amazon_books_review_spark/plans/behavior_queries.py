"""Behavioral-analytics and entity-resolution queries: funnel
conversion, event-transition matrix, weekly cohort retention, and a
blocked fuzzy-match join.

The reference has no event-analytics surface; these are the standard
product-analytics shapes every warehouse engine ships (funnel, Markov
transitions, cohorts) plus the record-linkage join a catalog-cleaning
pipeline needs.  All are single- or two-shuffle plans with exact
DuckDB oracles.

Timestamp conventions follow `sessionize_events`
(`plans/extended_queries.py`): outputs format timestamps as
``yyyy-MM-dd HH:mm:ss`` strings, durations via unix-seconds diffs,
session TZ pinned UTC so Spark's TIMESTAMP and DuckDB's naive parquet
reads agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_books_review_spark.sources.io import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------------------
# Funnel conversion (view -> click -> purchase, order-respecting)
# ---------------------------------------------------------------------------


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-respecting three-stage funnel per user: first ``view``,
    first ``click`` at-or-after that view, first ``purchase``
    at-or-after that click; ``funnel_depth`` counts stages reached.

    Scale design: ONE shuffle on ``user_id`` — the three stage
    timestamps are chained window-mins over the same unordered user
    partition (each stage's predicate references the previous stage's
    window result, so they evaluate as three Window ops on one
    Exchange), and the per-user collapse reuses the partitioning.
    No self-joins: the naive formulation joins events to events once
    per stage, which at 100 TB is three fact-fact shuffles instead of
    one.
    """
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        events.withColumn(
            "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    depth = (
        F.col("t_view").isNotNull().cast("int")
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    return per_user.select(
        "user_id",
        F.date_format("t_view", _TS_FMT).alias("t_view"),
        F.date_format("t_click", _TS_FMT).alias("t_click"),
        F.date_format("t_purchase", _TS_FMT).alias("t_purchase"),
        depth.alias("funnel_depth"),
    )


FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
    FROM events
), s2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
    FROM s1
), s3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
    FROM s2
), per_user AS (
    SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
           max(t_purchase) AS t_purchase
    FROM s3 GROUP BY user_id
)
SELECT user_id,
       strftime(t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
       strftime(t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
       strftime(t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase,
       CAST((t_view IS NOT NULL)::int + (t_click IS NOT NULL)::int
            + (t_purchase IS NOT NULL)::int AS INTEGER) AS funnel_depth
FROM per_user
"""


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts of consecutive (event_type -> next event_type) pairs per
    user stream — the first-order Markov transition matrix product
    analytics reads churn loops from.

    Scale design: one shuffle on ``user_id`` for the ``lead`` window
    (ordered by ``ts, event_id`` — the event_id tie-break makes the
    successor deterministic under equal timestamps), then the
    transition rollup shuffles the |event_types|^2-row grain.
    """
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


TRANSITION_ORACLE = """
WITH nxt AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM nxt WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


# ---------------------------------------------------------------------------
# Weekly cohort retention
# ---------------------------------------------------------------------------


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users cohorted by the ISO week of
    their first event; ``n_users`` = distinct users from that cohort
    active ``week_offset`` weeks later.

    Scale design: the first-event week is a window-min over one
    ``user_id`` shuffle; activity weeks dedupe on the
    (user, cohort, offset) grain *before* the cohort rollup, so the
    count-distinct never expands — at 100 TB the distinct is the
    expensive step and it is keyed (user, week), never global.
    """
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    weekly = (
        events.withColumn("cohort_week", F.date_trunc("week", F.min("ts").over(w)))
        .withColumn("event_week", F.date_trunc("week", F.col("ts")))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("event_week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        weekly.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


COHORT_ORACLE = """
WITH firsts AS (
    SELECT user_id, ts,
           date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort_week,
           date_trunc('week', ts) AS event_week
    FROM events
), weekly AS (
    SELECT DISTINCT user_id, cohort_week,
           CAST(date_diff('day', cohort_week, event_week) / 7 AS BIGINT)
               AS week_offset
    FROM firsts
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM weekly
GROUP BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# Blocked fuzzy match (entity resolution on the name-type table)
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2


def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage candidates over part names: pairs of DISTINCT
    names in the same block (the head noun — last token) within
    Levenshtein distance 2.

    Scale design: two standard ER reductions.  (1) Resolution runs on
    the name-TYPE table — the corpus collapses to distinct names
    first, so the pair stage is |name vocabulary|^2-bounded, not
    |rows|^2 (the same reduce `bpe_pair_counts` makes).  (2) Blocking
    on the head noun turns the cross join into an equi-join whose
    fan-out is the block-size distribution; distance <= 2 pairs that
    disagree on the noun are the documented recall trade, exactly as
    in production blocking.  The quadratic term never touches the
    full table.
    """
    parts = load_table(spark, sf_dir, "part")
    names = parts.select("p_name").distinct()
    block = F.element_at(F.split(F.col("p_name"), " "), -1)
    a = names.select(F.col("p_name").alias("name_a"), block.alias("block"))
    b = names.select(F.col("p_name").alias("name_b"), block.alias("block"))
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("block", "name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )


FUZZY_ORACLE = f"""
WITH names AS (
    SELECT DISTINCT p_name,
           list_extract(string_split(p_name, ' '), -1) AS block
    FROM part
)
SELECT a.block AS block, a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM names a JOIN names b ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# Purchase attribution (first / last touch)
# ---------------------------------------------------------------------------


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: each purchase credits the
    user's earliest and the most recent non-purchase event strictly
    before it; purchases with no prior touch credit ``(none)``.

    Scale design: ONE shuffle on user_id serves both attribution
    windows (``first``/``last`` with ignorenulls over the same
    unbounded-preceding frame) — the naive formulation is two
    events⋈events as-of self-joins, i.e. two extra fact-sized
    shuffles plus a per-purchase scan of the touch history.  Tie
    order is pinned (ts, event_id) so the credit assignment is
    deterministic and engine-exact.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


ATTRIBUTION_ORACLE = """
WITH ev AS (
    SELECT event_type,
           first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                       IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch,
           last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
    FROM events
)
SELECT coalesce(first_touch, '(none)') AS first_touch,
       coalesce(last_touch, '(none)') AS last_touch,
       count(*) AS n_purchases
FROM ev
WHERE event_type = 'purchase'
GROUP BY 1, 2
"""


BEHAVIOR_QUERIES = [
    ("funnel_conversion", funnel_conversion, FUNNEL_ORACLE,
     "order-respecting 3-stage funnel, one user shuffle, no self-joins"),
    ("purchase_attribution", purchase_attribution, ATTRIBUTION_ORACLE,
     "first/last-touch purchase attribution, one user shuffle for both windows"),
    ("event_transition_matrix", event_transition_matrix, TRANSITION_ORACLE,
     "first-order Markov transition counts via lead() window"),
    ("cohort_retention_weekly", cohort_retention_weekly, COHORT_ORACLE,
     "weekly cohort retention triangle, keyed distinct before rollup"),
    ("fuzzy_name_matches", fuzzy_name_matches, FUZZY_ORACLE,
     "blocked Levenshtein record linkage on the name-type table"),
]

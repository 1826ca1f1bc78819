"""Structural invariants for the round-6 corpus-statistics,
behavioral-analytics and SQL-surface waves — properties the DuckDB
parity check can't see (cross-query consistency, monotonicity,
conservation laws).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from amazon_books_review_spark.plans.behavior_queries import (
    cohort_retention_weekly,
    event_transition_matrix,
    funnel_conversion,
)
from amazon_books_review_spark.plans.corpus_stats_queries import (
    POSTINGS_SAMPLE_K,
    bpe_pair_counts,
    inverted_index_postings,
    source_zscore_quality,
    unigram_logprob_score,
)
from amazon_books_review_spark.plans.sqlsurface_queries import (
    copurchase_reach,
    date_spine_gapfill,
)
from amazon_books_review_spark.sources.io import load_table


def test_inverted_index_df_bounds_and_sample_cap(spark, sf_dir):
    idx = inverted_index_postings(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    bad_df = idx.filter((F.col("df") < 1) | (F.col("df") > n_docs)).count()
    assert bad_df == 0, "df outside [1, n_docs]"
    oversized = idx.filter(
        F.size(F.split("postings_sample", ",")) > POSTINGS_SAMPLE_K
    ).count()
    assert oversized == 0, "postings sample exceeds the K cap"
    # the sample is a prefix: its length is min(df, K)
    short = idx.filter(
        (F.col("df") >= POSTINGS_SAMPLE_K)
        & (F.size(F.split("postings_sample", ",")) < POSTINGS_SAMPLE_K)
    ).count()
    assert short == 0, "sample shorter than K for a term with df >= K"


def test_unigram_logprob_conservation(spark, sf_dir):
    scored = unigram_logprob_score(spark, sf_dir)
    # every avg logprob is <= 0 (probabilities <= 1) and finite
    bad = scored.filter(
        F.col("avg_logprob").isNull() | (F.col("avg_logprob") > 0)
    ).count()
    assert bad == 0
    # token totals conserve: sum over docs == corpus token count
    total = scored.agg(F.sum("n_tokens")).collect()[0][0]
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        F.size(F.split(F.trim(F.lower("text")), "\\s+")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total == corpus


def test_bpe_pair_mass_conservation(spark, sf_dir):
    from amazon_books_review_spark.plans.corpus_stats_queries import (
        BPE_MIN_PAIR_COUNT,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), "\\s+")).alias("w")
    ).filter((F.col("w") != "") & (F.length("w") >= 2))
    expected = words.select(
        (F.length("w") - 1).alias("n_pairs")
    ).agg(F.sum("n_pairs")).collect()[0][0]
    # UNFILTERED pair mass must equal the token-level pair count
    # exactly — an undercounting bug in the word-type reduction or the
    # pair explosion fails here, not just "<=".
    unfiltered = (
        words.groupBy(F.col("w").alias("word"))
        .agg(F.count("*").alias("n_word"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
            "n_word",
        )
        .groupBy("pair")
        .agg(F.sum("n_word").cast("long").alias("n"))
    )
    unfiltered_mass = unfiltered.agg(F.sum("n")).collect()[0][0]
    assert unfiltered_mass == expected
    # and the public (filtered) output drops EXACTLY the sub-threshold
    # pair mass — the docstring's "gap is the dropped pairs" claim
    got = bpe_pair_counts(spark, sf_dir).agg(F.sum("n")).collect()[0][0] or 0
    dropped_mass = (
        unfiltered.filter(F.col("n") < BPE_MIN_PAIR_COUNT)
        .agg(F.coalesce(F.sum("n"), F.lit(0)))
        .collect()[0][0]
    )
    assert got + dropped_mass == expected


def test_zscore_group_mean_is_zero(spark, sf_dir):
    z = source_zscore_quality(spark, sf_dir)
    stats = (
        z.groupBy("source")
        .agg(F.avg("z_len").alias("mu"), F.max(F.abs("z_len")).alias("mx"))
        .collect()
    )
    for row in stats:
        assert abs(row.mu) < 1e-3, f"{row}"
    # percent_rank spans [0, 1]
    bad = z.filter((F.col("pct_rank_len") < 0) | (F.col("pct_rank_len") > 1)).count()
    assert bad == 0


def test_funnel_stage_ordering(spark, sf_dir):
    f = funnel_conversion(spark, sf_dir)
    # stage timestamps are non-decreasing where present, and a later
    # stage implies every earlier one
    bad_order = f.filter(
        (F.col("t_click").isNotNull() & (F.col("t_click") < F.col("t_view")))
        | (F.col("t_purchase").isNotNull() & (F.col("t_purchase") < F.col("t_click")))
    ).count()
    assert bad_order == 0
    gaps = f.filter(
        (F.col("t_purchase").isNotNull() & F.col("t_click").isNull())
        | (F.col("t_click").isNotNull() & F.col("t_view").isNull())
    ).count()
    assert gaps == 0
    users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert f.count() == users


def test_transition_matrix_mass(spark, sf_dir):
    t = event_transition_matrix(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    total = t.agg(F.sum("n")).collect()[0][0]
    # each user stream of length L contributes L-1 transitions
    assert total == n_events - n_users


def test_cohort_week0_counts_every_user(spark, sf_dir):
    c = cohort_retention_weekly(spark, sf_dir)
    week0 = c.filter(F.col("week_offset") == 0).agg(F.sum("n_users")).collect()[0][0]
    users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == users  # everyone is active in their cohort week
    assert c.filter(F.col("week_offset") < 0).count() == 0


def test_date_spine_is_dense(spark, sf_dir):
    s = date_spine_gapfill(spark, sf_dir)
    n_days = s.count()
    bounds = s.agg(
        F.min(F.to_date("day")).alias("d0"), F.max(F.to_date("day")).alias("d1")
    ).collect()[0]
    assert n_days == (bounds.d1 - bounds.d0).days + 1, "calendar has holes"
    assert s.filter(F.col("n_orders") < 0).count() == 0


def test_reach_seed_at_hop_zero(spark, sf_dir):
    r = copurchase_reach(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    seed = li.agg(F.min("l_partkey")).collect()[0][0]
    rows = {row.partkey: row.hops for row in r.collect()}
    assert rows.get(seed) == 0
    assert all(0 <= h <= 2 for h in rows.values())

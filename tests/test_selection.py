"""Round-8 selection/sketch operators — properties beyond oracle parity.

Oracle parity (tests/test_oracle_parity.py) already value-checks all
of these against DuckDB; here we pin the properties parity can't see:
partitioning invariance (the rand()-free determinism claim) and the
KMV exact-mode contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_weighted_sample_repartition_stable(spark):
    """The A-ES sample is a pure function of doc_ids — identical under
    any partitioning (the property rand()-based sampling loses)."""
    from amazon_books_review_spark.plans.selection_queries import (
        weighted_sample_docs,
    )

    base = _rows(weighted_sample_docs(spark, SF))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert _rows(weighted_sample_docs(spark, SF)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_weighted_sample_prefers_heavier_docs(spark):
    """Selection probability rises with weight: the sampled docs'
    mean char count must exceed the corpus mean (k=100 of 500 docs —
    a uniform sample would match the corpus mean in expectation; the
    weighted one is materially above it)."""
    from amazon_books_review_spark.plans.selection_queries import (
        weighted_sample_docs,
    )
    from amazon_books_review_spark.sources.io import load_table

    sampled = weighted_sample_docs(spark, SF).agg(F.avg("n_chars")).first()[0]
    corpus = load_table(spark, SF, "documents").agg(F.avg("n_chars")).first()[0]
    assert sampled > corpus * 1.1, (sampled, corpus)


def test_kmv_exact_mode_when_sets_fit(spark):
    """Sides smaller than k must report EXACT estimates (theta = full
    space) — the standard KMV small-set contract."""
    from amazon_books_review_spark.plans.scale_ops_queries import (
        KMV_K,
        kmv_intersection_audit,
    )

    row = kmv_intersection_audit(spark, SF).first()
    assert row.exact_a < KMV_K and row.exact_b < KMV_K  # fixture premise
    assert row.est_a == float(row.exact_a)
    assert row.est_b == float(row.exact_b)
    assert row.est_inter == float(row.exact_inter)
    assert row.a_within_tol and row.b_within_tol and row.inter_within_tol


def test_kmv_accuracy_on_synthetic_sets(spark):
    """Estimator contract on CONTROLLED sizes/overlaps: k=256 sketch
    errors must stay under 25% (expected ~1/sqrt(k)=6% per side,
    amplified on the intersection).  md5 makes the draw deterministic,
    so these are stable pins, not flaky statistics — measured 8-10%
    side / 13-19% intersection error on these shapes."""
    from pyspark.sql import functions as F

    from amazon_books_review_spark.plans.scale_ops_queries import (
        kmv_intersection_estimates,
    )

    def sets(n, overlap):
        a = spark.range(n).select(
            F.lit("view").alias("event_type"),
            F.col("id").cast("string").alias("elem"),
        )
        b = spark.range(int(n * (1 - overlap)), int(n * (2 - overlap))).select(
            F.lit("purchase").alias("event_type"),
            F.col("id").cast("string").alias("elem"),
        )
        return a.unionByName(b)

    for n, ov in [(2000, 0.5), (8000, 0.25), (5000, 0.1)]:
        r = kmv_intersection_estimates(sets(n, ov)).first()
        assert r.exact_inter == int(n * ov)
        assert abs(r.est_a - r.exact_a) / r.exact_a < 0.25, (n, ov, r)
        assert abs(r.est_b - r.exact_b) / r.exact_b < 0.25, (n, ov, r)
        assert abs(r.est_inter - r.exact_inter) / r.exact_inter < 0.25, (n, ov, r)


def test_kmv_sketch_mode_engages_at_sf001(spark):
    """At sf0.01 both sides exceed k: the estimates must differ from
    exact (the sketch path ran) while staying inside the tolerance
    the audit promises."""
    from amazon_books_review_spark.plans.scale_ops_queries import (
        KMV_K,
        kmv_intersection_audit,
    )

    row = kmv_intersection_audit(spark, "/root/testdata/sf0.01").first()
    assert row.exact_a > KMV_K and row.exact_b > KMV_K
    assert row.est_a != float(row.exact_a)  # genuinely estimated
    assert row.a_within_tol and row.b_within_tol and row.inter_within_tol


def test_kmv_degenerate_inputs_always_one_row(spark):
    """Empty / one-side-empty inputs must still yield the 1-row audit
    frame (the oracle's conditional aggregates always produce one row;
    the round-8 review caught the engine returning zero rows when a
    side was empty and the per-side crossJoins annihilated)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from amazon_books_review_spark.plans.scale_ops_queries import (
        kmv_intersection_estimates,
    )

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("elem", StringType()),
        ]
    )

    # fully empty: one row, exact counts 0, estimates NULL
    empty = spark.createDataFrame([], schema)
    rows = kmv_intersection_estimates(empty).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.exact_a, r.exact_b, r.exact_inter) == (0, 0, 0)
    assert r.est_a is None and r.est_b is None and r.est_inter is None

    # one side empty: one row, empty side estimates NULL, the present
    # side exact-mode, intersection estimate 0 and within tolerance
    one_side = spark.range(10).select(
        F.lit("view").alias("event_type"),
        F.col("id").cast("string").alias("elem"),
    )
    rows = kmv_intersection_estimates(one_side).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.exact_a, r.exact_b, r.exact_inter) == (10, 0, 0)
    assert r.est_a == 10.0 and r.est_b is None
    assert r.est_inter == 0.0 and r.inter_within_tol


def test_char_entropy_empty_text_has_zero_distinct_chars(spark, tmp_path):
    """ADVICE r9: split('', '') yields [''], which used to count a
    phantom distinct char on empty documents.  Empty text must report
    n_distinct_chars=0 (matching the oracle's unnest-over-nothing);
    single-char runs still fold correctly."""
    from amazon_books_review_spark.plans.selection_queries import (
        char_entropy_quality,
    )

    spark.createDataFrame(
        [(1, ""), (2, "aaaa"), (3, "ab")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r for r in char_entropy_quality(spark, str(tmp_path)).collect()
    }
    assert got[1].n_chars == 0 and got[1].n_distinct_chars == 0
    assert got[2].n_distinct_chars == 1 and got[2].entropy_bits == 0.0
    assert got[3].n_distinct_chars == 2 and got[3].entropy_bits == 1.0

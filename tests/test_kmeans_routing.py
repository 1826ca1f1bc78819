"""Routed (coarse -> fine) k-means assignment — the SemDeDup large-k
scale path (round-6 verdict #2).

The contract under test: routing is APPROXIMATE relative to
brute-force nearest-of-k (a point may land on its best in-cell
centroid rather than the global nearest) but fully DETERMINISTIC, it
degenerates to exact brute force at g=1, and it keeps assignment
quality close enough that SemDeDup's kept-set barely moves.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def test_routed_g1_equals_brute_force(spark):
    """g=1 puts every fine centroid in one cell: the routed path must
    reproduce brute-force assignment bit-for-bit."""
    from amazon_books_review_spark.plans.scale_ops_queries import (
        _km_final_assignment,
    )

    exact = {
        r.vec_id: (r.cluster, r.dist_sq)
        for r in _km_final_assignment(spark, SF, k=10, route=False).collect()
    }
    routed = {
        r.vec_id: (r.cluster, r.dist_sq)
        for r in _km_final_assignment(spark, SF, k=10, route=True, g=1).collect()
    }
    assert routed == exact


def test_routed_deterministic_across_partitionings(spark):
    """Same routed assignment under a different input partitioning —
    the bit-stability claim the DuckDB oracle relies on."""
    from amazon_books_review_spark.plans.scale_ops_queries import (
        kmeans_routed_assign,
    )

    a = {r.vec_id: (r.cluster, r.dist_sq)
         for r in kmeans_routed_assign(spark, SF).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = {r.vec_id: (r.cluster, r.dist_sq)
             for r in kmeans_routed_assign(spark, SF).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_routed_distance_never_better_than_exact(spark):
    """For ONE assignment pass against the SAME centroids, routing can
    only restrict the candidate set: per point dist_sq(routed) >=
    dist_sq(exact), equality when the global nearest centroid lives in
    the routed cell.  (Full Lloyd runs diverge — iteration
    assignments feed centroid updates — so the invariant is a
    per-pass property.)  Also bounds the damage: the vast majority of
    points must still get their true nearest centroid."""
    from pyspark.sql import functions as F

    from amazon_books_review_spark.plans.scale_ops_queries import (
        KM_Q,
        _km_assign,
        _km_assign_routed,
    )
    from amazon_books_review_spark.sources.io import load_table

    k, g = 16, 4
    qdf = load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * KM_Q).cast("long")
        ).alias("qv"),
    )
    seeds = qdf.orderBy("vec_id").limit(k).collect()
    centroids = [(i, list(r["qv"])) for i, r in enumerate(seeds)]
    exact = {r.vec_id: r.dist_sq for r in _km_assign(qdf, centroids).collect()}
    routed = {
        r.vec_id: r.dist_sq
        for r in _km_assign_routed(qdf, centroids, g).collect()
    }
    assert set(exact) == set(routed)
    for vid, d in routed.items():
        assert d >= exact[vid], f"routed beat exact for {vid} — impossible"
    # Quality bound: total squared distance may inflate only modestly.
    # (Per-point cluster ids CAN differ often — high-dim embedding
    # distances concentrate, so many near-ties flip cells — but the
    # distance cost of those flips must stay small, which is what
    # SemDeDup's kept-set stability actually depends on.)
    inflation = sum(routed.values()) / sum(exact.values())
    assert inflation <= 1.10, f"routed total distance {inflation:.3f}x exact"


def test_semdedup_large_k_auto_routes_and_keeps_consistent(spark):
    """k >= KM_ROUTE_MIN_K flips semdedup's clustering to the routed
    path automatically; the kept/dropped decision stays internally
    consistent (dup_of always an earlier id in the same run) and the
    kept fraction stays in the same band as the exact-k run."""
    from amazon_books_review_spark.plans.scale_ops_queries import (
        KM_ROUTE_MIN_K,
        semdedup_embeddings,
    )

    rows = semdedup_embeddings(spark, SF, k=KM_ROUTE_MIN_K).collect()
    assert rows
    kept = sum(r.kept for r in rows)
    for r in rows:
        if r.kept:
            assert r.dup_of is None
        else:
            assert r.dup_of is not None and r.dup_of < r.vec_id
    # Near-dup pairs are overwhelmingly captured regardless of the
    # clustering: the kept fraction should not collapse or explode.
    assert 0.5 <= kept / len(rows) <= 1.0

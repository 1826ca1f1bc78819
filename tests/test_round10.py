"""Round-10 operators — properties beyond oracle parity.

Oracle parity (tests/test_oracle_parity.py) value-checks all of these
against DuckDB; here we pin the properties parity can't see: the
salted top-k's equivalence contract on adversarially skewed/tied
input, the compaction planner's bin-shape guarantees, and the epoch
reshuffle's permutation independence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_salted_topk_equals_plain_on_skewed_ties(spark):
    """One hot key with heavy ties plus singleton keys: the two-phase
    salted top-k must return row-identical results to the plain
    window top-k for any salt fan-out."""
    from amazon_books_review_spark.operators.windows import (
        salted_top_k_per_key,
        top_k_per_key,
    )

    rows = [("hot", i, float(v)) for i, v in enumerate([7, 7, 7, 7, 5, 5, 9])]
    rows += [("cold1", 100, 1.0), ("cold2", 101, 2.0)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    order = [F.col("v").desc(), F.col("id").asc()]
    want = sorted(
        tuple(r)
        for r in top_k_per_key(df, ["grp"], order, k=3).select(
            "grp", "id", "v", "rank"
        ).collect()
    )
    for n_salts in (1, 2, 5):
        got = sorted(
            tuple(r)
            for r in salted_top_k_per_key(
                df, ["grp"], order, k=3,
                salt_col=F.pmod(F.col("id"), F.lit(n_salts)).cast("int"),
                n_salts=n_salts,
            ).select("grp", "id", "v", "rank").collect()
        )
        assert got == want, f"n_salts={n_salts}"


def test_salted_topk_k_larger_than_group(spark):
    """k exceeding a group's size returns the whole group, ranked."""
    from amazon_books_review_spark.operators.windows import salted_top_k_per_key

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0)], "grp string, id long, v double"
    )
    out = salted_top_k_per_key(
        df, ["grp"], [F.col("v").desc(), F.col("id").asc()], k=10,
        salt_col=F.pmod(F.col("id"), F.lit(4)).cast("int"),
    ).collect()
    assert sorted((r.id, r.rank) for r in out) == [(1, 2), (2, 1)]


def test_compaction_bins_are_contiguous_and_offset_bounded(spark):
    """Next-fit-by-offset invariants: files in name order get
    non-decreasing bin ids, every file's START offset falls inside its
    bin's [b*T, (b+1)*T) range, and bin totals exceed the target by at
    most one straddling file."""
    from amazon_books_review_spark.plans.lakehouse_queries import (
        COMPACT_TARGET_CHARS,
        compaction_bin_packing,
    )

    rows = compaction_bin_packing(spark, SF).orderBy("file_name").collect()
    cum = 0
    prev_bin = -1
    for r in rows:
        start = cum
        assert r.bin_id >= prev_bin, "bin ids must be non-decreasing"
        assert r.bin_id == start // COMPACT_TARGET_CHARS
        prev_bin = r.bin_id
        cum += r.size_chars
    from collections import defaultdict

    totals = defaultdict(int)
    maxfile = defaultdict(int)
    for r in rows:
        totals[r.bin_id] += r.size_chars
        maxfile[r.bin_id] = max(maxfile[r.bin_id], r.size_chars)
        assert r.bin_total_chars >= r.size_chars
    for b, tot in totals.items():
        assert tot <= COMPACT_TARGET_CHARS + maxfile[b], (
            f"bin {b} exceeds target by more than one straddling file"
        )


def test_epoch_shuffle_is_per_epoch_permutation_and_independent(spark):
    """Every (epoch, shard) position sequence is dense 1..n; each
    epoch covers every doc exactly once; and epoch orders actually
    DIFFER (the reshuffle is not the identity between epochs)."""
    from amazon_books_review_spark.plans.traindata_queries import (
        N_EPOCHS,
        epoch_shuffle_assignment,
    )

    rows = epoch_shuffle_assignment(spark, SF).collect()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == set(range(N_EPOCHS))
    n_docs = len(by_epoch[0])
    orders = {}
    for e, rs in by_epoch.items():
        assert len({r.doc_id for r in rs}) == len(rs) == n_docs
        from collections import defaultdict

        per_shard = defaultdict(list)
        for r in rs:
            per_shard[r.shard].append(r.pos)
        for shard, poss in per_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), (e, shard)
        orders[e] = [
            r.doc_id for r in sorted(rs, key=lambda r: (r.shard, r.pos))
        ]
    assert orders[0] != orders[1] != orders[2]


def test_matryoshka_recall_bounds_and_probe_coverage(spark):
    """recall in [0, 1], one row per probe, n_overlap consistent."""
    from amazon_books_review_spark.plans.northstar_queries import N_PROBES, TOPK_K
    from amazon_books_review_spark.plans.retrieval_queries import (
        matryoshka_recall_audit,
    )

    rows = matryoshka_recall_audit(spark, SF).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert 0 <= r.n_overlap <= TOPK_K
        assert abs(r.recall_at_k - round(r.n_overlap / TOPK_K, 6)) < 1e-12


def test_rrf_score_composition(spark):
    """A doc ranked by both arms must score the sum of both reciprocal
    terms; a doc present in only one arm scores only that term."""
    from amazon_books_review_spark.plans.retrieval_queries import (
        RRF_K,
        rrf_hybrid_retrieval,
    )

    rows = rrf_hybrid_retrieval(spark, SF).collect()
    assert rows, "fusion returned nothing"
    for r in rows:
        want = 0.0
        if r.lex_rank is not None:
            want += 1.0 / (RRF_K + r.lex_rank)
        if r.prior_rank is not None:
            want += 1.0 / (RRF_K + r.prior_rank)
        assert abs(r.rrf_score - round(want, 6)) < 1e-12
        assert r.lex_rank is not None or r.prior_rank is not None

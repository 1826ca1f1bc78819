"""Round-16 pins: the bitext/hardneg LSH-multiprobe swap (VERDICT r15
#1/#3), the shared Arrow signature kernel (VERDICT r15 #4), the
lsh_planes_for clamp warning (ADVICE r14, deferred twice), and the
top-k overlap-contract audit (VERDICT r15 #5)."""

from __future__ import annotations

from pathlib import Path

import pytest

from amazon_books_review_spark.functions import similarity
from amazon_books_review_spark.plans import northstar_queries as nq

SF_SMOKE = Path("/root/testdata/sf0.001")


def _require_fixtures():
    if not (SF_SMOKE / "embeddings.parquet").exists():
        pytest.skip(f"{SF_SMOKE} absent in this environment")


# ---------------------------------------------------------------------------
# Capacity constants ARE their derivations (the r15 pattern extended
# to the two new families) — a drive-by constant edit that breaks the
# derivation contract fails here, not in a driver round.


def test_bitext_lsh_tables_match_derivation():
    assert nq.BITEXT_LSH_T_BY_B == similarity.lsh_tables_by_planes(
        nq.BITEXT_LSH_DESIGN_SIM,
        nq.BITEXT_LSH_TARGET_RECALL_PCT + nq.BITEXT_LSH_DERIVATION_MARGIN_PCT,
        probe_bits=nq.BITEXT_LSH_PROBE_BITS,
        min_planes=nq.BITEXT_LSH_MIN_PLANES,
        max_planes=nq.BITEXT_LSH_MAX_PLANES,
        max_tables=nq.BITEXT_LSH_MAX_TABLES,
    )
    # the values the oracle CASE inlines at the scales that matter:
    # parity corpora (b=3), sf0.1 (b=5), the r15 8k point (b=7), a
    # 20k sf1 (b=9)
    assert {b: nq.BITEXT_LSH_T_BY_B[b] for b in (3, 5, 7, 9)} == {
        3: 2, 5: 5, 7: 9, 9: 17
    }


def test_hardneg_lsh_tables_match_derivation():
    assert nq.HARDNEG_LSH_T_BY_B == similarity.lsh_tables_by_planes(
        nq.HARDNEG_LSH_DESIGN_SIM,
        nq.HARDNEG_LSH_TARGET_RECALL_PCT + nq.HARDNEG_LSH_DERIVATION_MARGIN_PCT,
        probe_bits=nq.HARDNEG_LSH_PROBE_BITS,
        min_planes=nq.HARDNEG_LSH_MIN_PLANES,
        max_planes=nq.HARDNEG_LSH_MAX_PLANES,
        max_tables=nq.HARDNEG_LSH_MAX_TABLES,
    )
    # design sim 0.45 (the negatives' band floor): one table more at
    # b=6 than the 0.5 derivation — the +8 recall points at sf0.1
    assert nq.HARDNEG_LSH_T_BY_B[6] == 7


# ---------------------------------------------------------------------------
# Recall floors on the parity corpus (the audits are the acceptance
# rows; sf0.1/sf1 points are measured per-round and recorded in
# PERF.md — these pins keep the small-scale end honest).


def test_bitext_lsh_recall_audit_meets_floor(spark):
    _require_fixtures()
    (row,) = nq.bitext_lsh_recall_audit(spark, str(SF_SMOKE)).collect()
    assert row["recall_pct"] >= nq.BITEXT_LSH_TARGET_RECALL_PCT, row
    assert row["precision_pct"] >= 75, row


def test_hardneg_lsh_recall_audit_meets_floor(spark):
    _require_fixtures()
    rows = nq.hardneg_lsh_recall_audit(spark, str(SF_SMOKE)).collect()
    assert rows, "no probes"
    total_exact = sum(r["n_exact"] for r in rows)
    total_hit = sum(r["n_hit"] for r in rows)
    assert total_hit * 100 // total_exact >= nq.HARDNEG_LSH_TARGET_RECALL_PCT, [
        (r["query_id"], r["recall_pct"]) for r in rows
    ]


# ---------------------------------------------------------------------------
# The shared Arrow signature kernel must agree bit-for-bit with the
# inline expression path (signature_cell) — the cross-implementation
# determinism the SQL replay relies on.


def test_lsh_signatures_match_expression_path(spark):
    _require_fixtures()
    from pyspark.sql import functions as F

    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet")).limit(64)
    n_planes, n_tables, dim = 5, 3, nq.EMB_DIM
    arrow = similarity.lsh_signatures(
        emb, "vec_id", "vec_id", "embedding", n_planes, n_tables, dim
    )
    expr_tables = [
        emb.select(
            F.col("vec_id"),
            F.lit(t).cast("int").alias("table_id"),
            similarity.signature_cell(
                F.col("embedding"), dim, n_planes, table=t
            ).alias("sig"),
        )
        for t in range(n_tables)
    ]
    expr = expr_tables[0]
    for df in expr_tables[1:]:
        expr = expr.unionByName(df)
    a = sorted(map(tuple, arrow.collect()))
    e = sorted(map(tuple, expr.collect()))
    assert a == e


# ---------------------------------------------------------------------------
# lsh_planes_for clamp warning (ADVICE r14-low, deferred twice): when
# the corpus outgrows 2^max_planes * occupancy the derivation must
# SIGNAL, not silently return a busted occupancy budget.


def test_lsh_planes_for_warns_when_clamp_binds():
    with pytest.warns(RuntimeWarning, match="clamped at max_planes"):
        b = similarity.lsh_planes_for(10_000, 4, min_planes=2, max_planes=8)
    assert b == 8


def test_lsh_planes_for_no_warning_inside_budget(recwarn):
    b = similarity.lsh_planes_for(1_000, 4, min_planes=2, max_planes=10)
    assert b == 8
    assert not [w for w in recwarn if issubclass(w.category, RuntimeWarning)]


# ---------------------------------------------------------------------------
# Top-k overlap audit (VERDICT r15 #5): the row exists to RECORD the
# oversampling contract — overlap is expected to be low and the test
# pins only that the audit runs, is per-probe complete, and that
# n_hit never exceeds n_exact (a sanity invariant, not a recall bar).


def test_lsh_topk_overlap_audit_shape(spark):
    _require_fixtures()
    rows = nq.lsh_topk_overlap_audit(spark, str(SF_SMOKE)).collect()
    assert len(rows) == nq.N_PROBES
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_exact"] == nq.TOPK_K
        assert r["overlap_pct"] == r["n_hit"] * 100 // r["n_exact"]


# ---------------------------------------------------------------------------
# lsh_tables_checked clamp warning (the tables-side twin, added after
# the r16 third-decade probe measured the 32-table clamp binding
# SILENTLY at 200k vectors — recall 66.6% vs the 85% target,
# SF10_NEARDUP_R16.json / PERF.md r16 #7): a runtime-derived plane
# count whose table derivation hit the ceiling must SIGNAL that the
# recall target is no longer certified.


def test_lsh_tables_checked_warns_when_clamp_binds():
    # b=13 is the 200k-vector operating point of the SHIPPED near-dup
    # config: derived need ~41 > the 32-table ceiling
    with pytest.warns(RuntimeWarning, match="table clamp binds"):
        t = similarity.lsh_tables_checked(
            nq.NEARDUP_LSH_T_BY_B, 13, max_tables=nq.NEARDUP_LSH_MAX_TABLES
        )
    assert t == 32


def test_lsh_tables_checked_silent_inside_certified_band(recwarn):
    # b=10 is the sf1 operating point (T=27, measured 93.4% recall)
    t = similarity.lsh_tables_checked(
        nq.NEARDUP_LSH_T_BY_B, 10, max_tables=nq.NEARDUP_LSH_MAX_TABLES
    )
    assert t == 27
    assert not [w for w in recwarn if issubclass(w.category, RuntimeWarning)]

"""Round-18 artifact invariants: the lifted-ceiling re-certification
(VERDICT r17 #4), the orthogonalized-planes keep-or-kill decision
(VERDICT r17 #8), and the partition-local-multiprobe bitext decade
walls (VERDICT r17 #7).  All guards read committed SF*_R18 artifacts
— cheap, no Spark; a regeneration below a declared bar turns the
suite red instead of letting the claim rot."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

MODEL_ERROR_BUDGET_PTS = 10


def _load(name: str) -> dict | None:
    path = REPO / name
    if not path.exists():
        return None
    return json.loads(path.read_text())


#: r18 artifact -> (expected (T, pb) from the lifted derivation, the
#: r17 clamped-T=32 artifact whose recall it must beat and whose
#: exact pair count it must reproduce).  Measured: 1M 92.6% (clamped:
#: 89.7), 2M 93.0% (clamped: 81.0 — the broken floor, restored).
LIFTED_POINTS = {
    "SF50_NEARDUP_T64_R18.json": ((37, 2), "SF50_NEARDUP_R17.json"),
    "SF100_NEARDUP_T64_R18.json": ((52, 2), "SF100_NEARDUP_R17.json"),
}


@pytest.mark.parametrize("name,spec", sorted(LIFTED_POINTS.items()))
def test_lifted_ceiling_recertifies_past_the_clamp(name, spec):
    """The measured half of r17's derivation-only claim: at a
    cluster-scale table budget (max_tables=64) the adaptive plan
    certifies b=15 as (T=37, pb=2) and b=16 as (T=52, pb=2), and the
    measured recall must beat both the 90% derivation target and the
    T=32 clamped reading (89.7% at 1M; 81.0% at 2M — the broken
    floor).  The exact sampled arm is seed-deterministic — its pair
    count must equal the r17 artifact's to the row, proving both
    rounds audited the same ground truth.  Cost scales ~T (lsh arm
    60 -> 95 s at 1M, 143 -> 199 s at 2M): recall is bought back with
    tables, linearly, exactly as the union rule says."""
    (t_pb, r17_name) = spec
    d = _load(name)
    if d is None:
        pytest.skip(f"{name} not generated yet")
    assert d["max_tables"] == 64
    assert d["table_clamp_binds"] is False
    assert (d["n_tables"], d["probe_bits"]) == t_pb
    assert d["recall_pct"] >= 90.0, (
        f"{name}: fell below the 90% derivation target"
    )
    r17 = _load(r17_name)
    if r17 is not None:
        assert d["recall_pct"] > r17["recall_pct"], (
            "lifting max_tables must beat the clamped T=32 recall"
        )
        assert d["n_exact_sampled"] == r17["n_exact_sampled"], (
            "exact sampled arm diverged across rounds — fixture or"
            " seed drift"
        )
    err = abs(d["recall_pct"] - d["predicted_recall_pct"])
    assert err < MODEL_ERROR_BUDGET_PTS


def test_ortho_planes_kill_decision_is_measured():
    """VERDICT r17 #8 keep-or-kill: KILLED, with the curve committed.
    Gram-Schmidt orthogonalization LOWERS the per-table Hamming-<=2
    hit rate (the i.i.d. md5 planes' slight bit correlations help a
    pair agree on whole signatures) and so RAISES the derived table
    need — if a regeneration ever shows ortho winning, this gate
    flags that the kill decision needs revisiting, and vice versa."""
    d = _load("SF10_ORTHO_PLANES_R18.json")
    if d is None:
        pytest.skip("SF10_ORTHO_PLANES_R18.json not generated yet")
    assert d["iid"]["per_table_hit_pct_mean"] > d["ortho"]["per_table_hit_pct_mean"]
    assert d["iid"]["min_T_for_90"] <= d["ortho"]["min_T_for_90"]
    # replica cross-validation: the numpy harness's i.i.d. recall at
    # the shipped operating point (b=13, T=20) must reproduce the
    # r17 SPARK-measured 92.9% — the two measurement stacks agree
    assert abs(d["iid"]["recall_by_T"][19] - 92.9) < 1.0


#: byte-identity across the transport rewrite: the partition-local
#: multiprobe changes WHERE probe rows expand, never which buckets
#: exist — re-runs at r17's decades must mine the exact pair counts
#: r17 recorded, at a wall no worse than the committed envelope.
BITEXT_IDENTITY = {
    # r18 artifact                      r17 artifact (pairs must match)
    "SF10_BITEXT_ADAPTIVE_R18.json": "SF10_BITEXT_ADAPTIVE_R17.json",
    "SF20_BITEXT_ADAPTIVE_R18.json": "SF20_BITEXT_ADAPTIVE_R17.json",
}


@pytest.mark.parametrize("r18,r17", sorted(BITEXT_IDENTITY.items()))
def test_bitext_local_transport_byte_identical(r18, r17):
    a, b = _load(r18), _load(r17)
    if a is None or b is None:
        pytest.skip(f"{r18} or {r17} not generated yet")
    assert a["n_mined_pairs"] == b["n_mined_pairs"], (
        f"{r18}: partition-local transport changed the mined set"
    )
    assert (a["derived_planes"], a["n_tables"], a["probe_bits"]) == (
        b["derived_planes"], b["n_tables"], b["probe_bits"],
    )


def test_bitext_500k_decade():
    """The fourth bitext decade (VERDICT r17 #7): 500k/side at the
    adaptive certified config — reachable at all only because of the
    partition-local transport (the r17 explode shape was headed for
    ~100 GB of vector-carrying exchange on a 78 GB disk; the measured
    run peaked ~71 GB TOTAL used including the margin shuffle).
    Measured 389,163 pairs in 1543 s on a day benching ~1.35x slow
    (the same session's 1M exact arm read 1302 s vs r17's 995 s);
    the candidate-term model predicts x4.2 over the 200k decade and
    the day-normalized measurement reads ~x4.7."""
    d = _load("SF50_BITEXT_ADAPTIVE_R18.json")
    if d is None:
        pytest.skip("SF50_BITEXT_ADAPTIVE_R18.json not generated yet")
    assert d["n_tgt"] == 500_000
    assert (d["derived_planes"], d["n_tables"], d["probe_bits"]) == (14, 23, 2)
    assert d["n_mined_pairs"] == 389_163, "mined set drifted at the decade"
    assert d["wall_sec"] <= 3100, "2x envelope over the committed wall"


def test_bitext_500k_coverage_holds_floor():
    """Coverage audit at the new decade (recall == coverage by the
    r15 lossless-tail decomposition): measured 94.1% at 500k/side —
    above the 85 floor and the 92 derivation target, completing the
    50k/200k/500k coverage series (91.2 / 92.1 / 94.1)."""
    d = _load("SF50_BITEXT_COVERAGE_R18.json")
    if d is None:
        pytest.skip("SF50_BITEXT_COVERAGE_R18.json not generated yet")
    assert d["probe_bits"] == 2
    assert d["coverage_pct"] >= 85


#: the self-form (near-dup) moved to the partition-local transport
#: too — full-corpus wall re-runs must mine the exact r17 pair counts
NEARDUP_IDENTITY = {
    "SF10_NEARDUP_WALL_R18.json": ("SF10_NEARDUP_WALL_R17.json", 260),
    "SF25_NEARDUP_WALL_R18.json": ("SF25_NEARDUP_WALL_R17.json", 1300),
}


@pytest.mark.parametrize("r18,pair", sorted(NEARDUP_IDENTITY.items()))
def test_neardup_local_transport_byte_identical(r18, pair):
    r17_name, envelope = pair
    a, b = _load(r18), _load(r17_name)
    if a is None or b is None:
        pytest.skip(f"{r18} or {r17_name} not generated yet")
    assert a["n_pairs"] == b["n_pairs"], (
        f"{r18}: partition-local transport changed the mined set"
    )
    assert (a["derived_planes"], a["n_tables"], a["probe_bits"]) == (
        b["derived_planes"], b["n_tables"], b["probe_bits"],
    )
    # generous 2x-over-r17 x day-noise envelope: the transport must
    # not regress the wall class even on a slow day
    assert a["wall_sec"] <= envelope

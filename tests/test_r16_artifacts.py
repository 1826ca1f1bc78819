"""Round-16 artifact invariants.

Two kinds of guard, both cheap (no Spark session):

1. Timing coverage: every catalog entry must have a recorded timing
   SOMEWHERE — in bench.HEADLINE (the gated lane) or in the latest
   committed BENCH_APPENDIX_r*.json (VERDICT r15 #7).  Adding a
   catalog entry without either adding it to HEADLINE or re-running
   ``python bench.py --appendix`` fails here instead of silently
   re-opening the transparency gap.

2. Declared floors on the committed sf1 audit artifacts: the recall
   numbers PERF.md cites are load-bearing claims; if a future round
   regenerates an artifact below the declared floor, the suite turns
   red rather than the claim silently rotting.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

#: The engine-wide declared recall floor for the approximate mining
#: tiers (northstar_queries BITEXT_LSH_TARGET_RECALL_PCT /
#: NEARDUP_LSH_TARGET_RECALL_PCT are both derived against 85).
DECLARED_FLOOR_PCT = 85


def _latest(glob: str) -> Path | None:
    paths = sorted(REPO.glob(glob))
    return paths[-1] if paths else None


def test_every_catalog_entry_has_a_recorded_timing():
    import bench
    from amazon_books_review_spark.plans.catalog import all_queries

    appendix = _latest("BENCH_APPENDIX_r*.json")
    assert appendix is not None, (
        "no BENCH_APPENDIX_r*.json committed — run `python bench.py"
        " --appendix` once per round so non-headline entries keep a"
        " recorded timing"
    )
    recorded = set(json.loads(appendix.read_text())["queries"])
    recorded |= set(bench.HEADLINE)
    missing = sorted(set(all_queries()) - recorded)
    assert not missing, (
        f"catalog entries with no recorded timing (not in bench.HEADLINE"
        f" and absent from {appendix.name}): {missing} — add them to"
        f" HEADLINE or re-run `python bench.py --appendix`"
    )


def test_latest_appendix_artifact_ran_clean():
    appendix = _latest("BENCH_APPENDIX_r*.json")
    if appendix is None:
        pytest.skip("no appendix artifact")
    d = json.loads(appendix.read_text())
    assert d["n_errors"] == 0, f"{appendix.name} has errors: {d['errors']}"
    assert d["n_timed"] > 0


@pytest.mark.parametrize(
    "glob,recall_key",
    [
        ("SF1_NEARDUP_R*.json", "recall_pct"),
        ("SF1_BITEXT_R*.json", "recall_pct"),
    ],
)
def test_sf1_recall_artifacts_hold_declared_floor(glob, recall_key):
    path = _latest(glob)
    if path is None:
        pytest.skip(f"no {glob} artifact")
    d = json.loads(path.read_text())
    assert d[recall_key] >= DECLARED_FLOOR_PCT, (
        f"{path.name}: recorded sf1 recall {d[recall_key]} is below the"
        f" declared {DECLARED_FLOOR_PCT}% floor PERF.md claims"
    )
    # the artifact must say what configuration produced it
    for key in ("derived_planes", "n_tables", "probe_bits"):
        assert key in d, f"{path.name} missing provenance field {key}"

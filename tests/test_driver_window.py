"""Driver verification-window invariants (VERDICT r3 "do this" #1-#3).

The round driver records CORRECTNESS rows for the first 50 entries of
``__spark_entry__.queries()`` **in dict iteration order** (round 3
proved empirically that it does not re-sort: CORRECTNESS_r03.json was
exactly the iteration-order prefix, which is why the r3 rotation —
sorted by canonical name — silently verified nothing new).

``catalog.driver_queries`` / ``driver_oracles`` therefore build their
dicts sorted by the DRIVER-FACING key, with already-verified names
rotated behind a round-stamped ``zz_rNN_`` prefix.  These tests lock:

* the rename is a bijection (no collisions, perfectly invertible),
* queries and oracles use the same mapping (the driver pairs by key),
* iteration order equals alphabetical order (window identical under
  either driver model),
* the ledger is derived from the recorded CORRECTNESS_r*.json
  artifacts, not hand-maintained,
* a simulation of the driver's exact consumption —
  ``list(__spark_entry__.queries().items())[:50]`` — covers every
  never-verified query, plus the stalest verified ones.
"""

from __future__ import annotations

import json
from pathlib import Path

from amazon_books_review_spark.plans.catalog import (
    DRIVER_VERIFIED,
    all_oracles,
    all_queries,
    canonical_name,
    driver_name,
    driver_oracles,
    driver_queries,
)

WINDOW = 50
REPO = Path(__file__).resolve().parents[1]


def test_rename_is_bijective():
    names = sorted(all_queries())
    renamed = [driver_name(n) for n in names]
    assert len(set(renamed)) == len(names), "driver_name collides"
    assert [canonical_name(r) for r in renamed] == names


def test_driver_verified_names_exist():
    missing = set(DRIVER_VERIFIED) - set(all_queries())
    assert not missing, f"DRIVER_VERIFIED references unknown queries: {missing}"


def test_driver_verified_is_derived_from_artifacts():
    """The ledger must agree row-for-row with the recorded artifacts."""
    expected: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        for key, row in json.loads(path.read_text()).items():
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                name = canonical_name(key)
                expected[name] = max(expected.get(name, 0), rnd)
    assert DRIVER_VERIFIED == expected


def test_queries_and_oracles_share_the_mapping():
    dq = driver_queries()
    do = driver_oracles()
    assert set(do) <= set(dq)
    for name, sql in all_oracles().items():
        assert do[driver_name(name)] == sql


def test_iteration_order_is_alphabetical():
    """Window identical whether the driver takes iteration order or re-sorts."""
    dq = list(driver_queries())
    assert dq == sorted(dq)
    do = list(driver_oracles())
    assert do == sorted(do)


def test_unverified_queries_fit_in_driver_window():
    # The driver consumes ITERATION order — assert on the iteration prefix,
    # not a re-sort (re-sorting here is exactly what masked the r3 failure).
    window = list(driver_queries())[:WINDOW]
    unverified = [n for n in all_queries() if n not in DRIVER_VERIFIED]
    assert len(unverified) <= WINDOW, (
        f"{len(unverified)} unverified queries cannot all fit in the "
        f"{WINDOW}-row window — trim additions this round"
    )
    outside = [n for n in unverified if n not in window]
    assert not outside, (
        f"{len(outside)} unverified queries fall outside the driver's "
        f"{WINDOW}-row iteration-order window: {outside}"
    )


def test_remaining_window_slots_go_to_stalest_verified():
    window = list(driver_queries())[:WINDOW]
    rounds_in = [DRIVER_VERIFIED[canonical_name(k)] for k in window if k.startswith("zz_")]
    rounds_out = [
        DRIVER_VERIFIED[canonical_name(k)] for k in list(driver_queries())[WINDOW:]
    ]
    # every verified name inside the window is at least as stale as any outside
    if rounds_in and rounds_out:
        assert max(rounds_in) <= min(rounds_out)


def test_spark_entry_simulated_driver_window():
    """Simulate the driver exactly: first 50 items of queries() as iterated."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert sorted(q) == sorted(driver_queries())

    consumed = [k for k, _fn in list(q.items())[:WINDOW]]
    unverified = {n for n in all_queries() if n not in DRIVER_VERIFIED}
    missing = unverified - set(consumed)
    assert not missing, (
        f"driver would NOT verify these never-verified queries: {sorted(missing)}"
    )
    # every unverified query in the window must carry a hard oracle or be a
    # declared rows-only entry; spot-check the oracle pairing exists
    for key in consumed:
        assert key in q

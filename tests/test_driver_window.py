"""Driver verification-window invariants (VERDICT r2 "do this" #1).

The round driver records CORRECTNESS rows for only the first 50
catalog names in alphabetical order.  ``catalog.driver_queries`` /
``driver_oracles`` rotate already-driver-green names behind a ``zz_``
prefix so every not-yet-verified query sorts into that window.  These
tests lock the properties that make the rotation sound:

* the rename is a bijection (no collisions, perfectly invertible),
* queries and oracles use the same mapping (the driver pairs by key),
* every query without a prior driver row lands inside the 50-row
  window, so CORRECTNESS_r03 gives it its first hard signal.
"""

from __future__ import annotations

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


def test_rename_is_bijective():
    names = sorted(all_queries())
    renamed = [driver_name(n) for n in names]
    assert len(set(renamed)) == len(names), "driver_name collides"
    assert [canonical_name(r) for r in renamed] == names


def test_driver_verified_names_exist():
    missing = set(DRIVER_VERIFIED) - set(all_queries())
    assert not missing, f"DRIVER_VERIFIED references unknown queries: {missing}"


def test_queries_and_oracles_share_the_mapping():
    dq = driver_queries()
    do = driver_oracles()
    assert set(do) <= set(dq)
    # every oracled canonical name appears under the same driver key
    for name, sql in all_oracles().items():
        assert do[driver_name(name)] == sql


def test_unverified_queries_fit_in_driver_window():
    dq = sorted(driver_queries())
    window = set(dq[:WINDOW])
    unverified = [n for n in all_queries() if n not in DRIVER_VERIFIED]
    outside = [n for n in unverified if driver_name(n) not in window]
    assert not outside, (
        f"{len(outside)} unverified queries sort outside the driver's "
        f"{WINDOW}-row window: {outside} — rotate more names in "
        "catalog.DRIVER_VERIFIED or trim additions this round"
    )


def test_spark_entry_exposes_window_names():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert sorted(q) == sorted(driver_queries())

"""Round-15 regression tests: solo-lane streaming floors, sf1_bench
argument validation, and the bitext-kmeans oracle-parity scale guard
(ADVICE r14 medium)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parents[1]


# ---------------------------------------------------------------------------
# VERDICT r14 #7: solo-retimed streaming entries carry their own floor
# ---------------------------------------------------------------------------

def test_net_of_floor_uses_solo_session_floor():
    import bench

    timings = {
        "streaming_windowed_counts": 2.0,   # solo-retimed, fresh session
        "streaming_dedup_events": 1.0,      # main warm session
        "tpch_q1_pricing_summary": 5.0,     # not streaming: excluded
    }
    net = bench._net_of_floor(
        timings,
        streaming_floor=0.4,
        solo_floors={"streaming_windowed_counts": 1.1},
    )
    assert net == {
        "streaming_windowed_counts": 0.9,  # 2.0 - its OWN 1.1s floor
        "streaming_dedup_events": 0.6,     # 1.0 - warm-session 0.4s
    }


def test_net_of_floor_failed_solo_floor_falls_back():
    import bench

    # a 0.0 solo floor means the measurement failed — fall back to the
    # session floor rather than reporting gross as net
    net = bench._net_of_floor(
        {"streaming_x": 1.0}, streaming_floor=0.4, solo_floors={"streaming_x": 0.0}
    )
    assert net == {"streaming_x": 0.6}
    # and never below zero
    net = bench._net_of_floor({"streaming_x": 0.2}, streaming_floor=0.4)
    assert net == {"streaming_x": 0.0}


# ---------------------------------------------------------------------------
# ADVICE r14 low: sf1_bench rejects unknown query names
# ---------------------------------------------------------------------------

def test_sf1_bench_rejects_unknown_query_names(tmp_path):
    """A typo'd query name (or queries passed without the out.json
    first argument) must exit nonzero before any Spark work, not
    silently run a wrong subset."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "sf1_bench.py"),
         str(tmp_path / "out.json"), "definitely_not_a_query"],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode != 0
    assert "definitely_not_a_query" in (proc.stderr + proc.stdout)


# ---------------------------------------------------------------------------
# ADVICE r14 medium: the bitext k-means oracle replays the EXACT brute
# n x k routing; the engine switches to approximate routed assignment
# at k >= KM_ROUTE_MIN_K.  Parity holds only while every verification
# corpus derives k BELOW that bound — pin it against the actual
# parquet footers so a fixture growth breaks loudly here, not as a
# silent oracle divergence.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", ["sf0.001", "sf0.01", "sf0.1"])
def test_bitext_kmeans_parity_corpora_stay_below_route_bound(sf_dir):
    from amazon_books_review_spark.plans.northstar_queries import (
        BITEXT_KM_KMAX,
        BITEXT_KM_KMIN,
        BITEXT_KM_OCC,
    )
    from amazon_books_review_spark.plans.scale_ops_queries import (
        KM_ROUTE_MIN_K,
        km_k_for,
    )

    path = Path("/root/testdata") / sf_dir / "embeddings.parquet"
    if not path.exists():
        pytest.skip(f"{path} absent in this environment")
    n = pq.read_metadata(path).num_rows
    k = km_k_for(n, BITEXT_KM_OCC, k_min=BITEXT_KM_KMIN, k_max=BITEXT_KM_KMAX)
    assert k < KM_ROUTE_MIN_K, (
        f"{sf_dir}: derived k={k} >= KM_ROUTE_MIN_K={KM_ROUTE_MIN_K} — "
        "the engine would route approximately while the DuckDB oracle "
        "replays exact brute assignment; shrink the fixture or raise "
        "KM_ROUTE_MIN_K with an oracle widening"
    )

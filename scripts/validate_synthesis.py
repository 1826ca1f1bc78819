#!/usr/bin/env python3
"""Validate the scale-curve SYNTHESIS METHODOLOGY against real data
(VERDICT r10 #7 / r11 #4).

The scale curves in PERF.md rest on replica-synthesized corpora
(scripts/scale_curve.py).  The driver generated three REAL scales
(sf0.001 / sf0.01 / sf0.1) with the same generator, so the
methodology is checkable without an sf1 drop: **real sf0.1 is the
ground-truth 10x of sf0.01** — if a query's wall time on the
synthesized 10x-of-sf0.01 corpus predicts its wall time on real
sf0.1 within ~1.5x, replica synthesis is a trustworthy stand-in for
generator-scaled data at the next decade too.

Two legs, one JSON artifact:

- ``validation``: per query, t(sf0.01), t(synth 10x of sf0.01),
  t(real sf0.1), and ``synth_over_real = t_synth10 / t_real10`` —
  the methodology verdict (plus output row counts on all three,
  since synthesis changes DATA semantics: salted replicas grow
  vocabulary 10x where the real generator reuses one vocabulary —
  divergences are findings, not failures, and get documented).
- ``sf1_scale``: the same queries at synth 10x of sf0.1 (sf1 VOLUME:
  ~6M lineitem rows — the largest corpus this sandbox comfortably
  materializes), with ``predicted_sec = t_real_sf0.1 x
  (t_synth10_sf0.01 / t_sf0.01)`` — testing whether the 10x ratio
  measured a decade lower still predicts the next decade.

Methodology per timed point mirrors scale_curve.py: warm the plan at
sf0.001 first; FORCE_ALL_COLUMNS queries time a noop-sink write
(count() would prune their expressions); t0 before the query fn call
(iterative operators do driver-sync work at construction time).

Usage: python scripts/validate_synthesis.py [out.json]
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

_SC_SPEC = importlib.util.spec_from_file_location(
    "abr_scale_curve", _REPO / "scripts" / "scale_curve.py"
)
sc = importlib.util.module_from_spec(_SC_SPEC)
# scale_curve parses REP/ONLY from sys.argv at import; shield it from
# THIS script's argv (module globals are re-pointed per leg below).
_argv, sys.argv = sys.argv, [sys.argv[0]]
_SC_SPEC.loader.exec_module(sc)
sys.argv = _argv

REAL_001 = "/root/testdata/sf0.01"
REAL_01 = "/root/testdata/sf0.1"
WARMUP = "/root/testdata/sf0.001"

#: 15 headline-representative queries spanning the operator families
#: whose curves PERF.md relies on (LSH dedup, ANN/IVF, clustering,
#: TPC-H joins/aggs, sketches, iterative graph, window analytics,
#: zero-shuffle scans, retrieval).
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_neardup_lsh_verified",
    "similarity_ivf_topk",
    "semdedup_embeddings",
    "kmeans_quantized_assign",
    "tpch_q9_product_profit",
    "tpch_q18_large_orders",
    "heavy_hitters_mg",
    "pagerank_copurchase",
    "triangle_count_copurchase",
    "label_propagation_communities",
    "gopher_repetition_rules",
    "scd2_user_segments",
    "rolling_hour_user_stats",
    "bm25_topk_docs",
]


def _time_one(spark, fn, sf_dir: str, force_all: bool) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    if force_all:
        df.write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 3)
        rows = df.count()
    else:
        rows = df.count()
        sec = round(time.perf_counter() - t0, 3)
    return sec, rows


def _synthesize(spark, base_sf: str, rep: int, tag: str) -> str:
    """Run scale_curve.synthesize with its module globals re-pointed."""
    sc.BASE_SF = base_sf
    sc.REP = rep
    sc.SCALED_DIR = f"/tmp/abr_validate_{tag}_{os.getpid()}"
    sc.PLANTED_1X = f"{sc.SCALED_DIR}_base1x"
    sc.synthesize(spark)
    return sc.SCALED_DIR


def main() -> None:
    from amazon_books_review_spark.plans.catalog import all_queries
    from amazon_books_review_spark.session import get_session

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1_VALIDATION.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        app_name="abr-validate-synthesis",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    dirs_to_sweep = []
    result: dict = {"validation": {}, "sf1_scale": {}, "cpus": cpus}
    try:
        synth10_001 = _synthesize(spark, REAL_001, 10, "s10of001")
        dirs_to_sweep += [sc.SCALED_DIR, sc.PLANTED_1X]

        for name in QUERIES:
            fn = queries[name]
            force = name in sc.FORCE_ALL_COLUMNS
            _time_one(spark, fn, WARMUP, force)  # warm plan/codegen
            t_small, r_small = _time_one(spark, fn, REAL_001, force)
            t_synth, r_synth = _time_one(spark, fn, synth10_001, force)
            t_real, r_real = _time_one(spark, fn, REAL_01, force)
            row = {
                "sf0.01_sec": t_small, "sf0.01_rows": r_small,
                "synth10_sec": t_synth, "synth10_rows": r_synth,
                "real_sf0.1_sec": t_real, "real_sf0.1_rows": r_real,
                "synth_over_real": round(t_synth / t_real, 3) if t_real else None,
            }
            result["validation"][name] = row
            print(json.dumps({"query": name, **row}), flush=True)

        synth10_01 = _synthesize(spark, REAL_01, 10, "s10of01")
        dirs_to_sweep += [sc.SCALED_DIR, sc.PLANTED_1X]

        for name in QUERIES:
            fn = queries[name]
            force = name in sc.FORCE_ALL_COLUMNS
            v = result["validation"][name]
            t_sf1, r_sf1 = _time_one(spark, fn, synth10_01, force)
            ratio_low = (
                v["synth10_sec"] / v["sf0.01_sec"] if v["sf0.01_sec"] else None
            )
            predicted = (
                round(v["real_sf0.1_sec"] * ratio_low, 3) if ratio_low else None
            )
            row = {
                "sec": t_sf1, "rows": r_sf1,
                "predicted_sec": predicted,
                "actual_over_predicted": (
                    round(t_sf1 / predicted, 3) if predicted else None
                ),
            }
            result["sf1_scale"][name] = row
            print(json.dumps({"query": name, "leg": "sf1", **row}), flush=True)
    finally:
        for d in dirs_to_sweep:
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()

    Path(out_path).write_text(json.dumps(result, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

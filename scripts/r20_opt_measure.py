#!/usr/bin/env python3
"""Round-19 optimization measurement harness.

Times named catalog queries in ONE warm session against the
bench-identical re-layout of $SPARK_GRAFT_SF_DIR (default sf0.1) with
the noop sink, and/or dumps their `.explain("formatted")` output to
plans/r20/<query>_<suffix>.txt — the before/after evidence files the
optimization round commits.

    python scripts/r20_opt_measure.py --time q1 q2 ...        # N reps each
    python scripts/r20_opt_measure.py --plans before q1 q2 ...
    python scripts/r20_opt_measure.py --time --plans after q1 ...

Methodology matches bench.py: sf0.001 warm-up pass per query first
(codegen/committer warm), then reps against the re-layout dir; the
min and the full shot list are printed as one JSON line per query.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

PLANS_DIR = REPO / "plans" / "r20"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--plans", default=None, metavar="SUFFIX")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--raw-layout", action="store_true",
                    help="skip the ingest re-layout (time raw files)")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import bench
    from amazon_books_review_spark.plans.catalog import all_queries
    from amazon_books_review_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        app_name="abr-r20-opt",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for q in args.queries:
        if q not in queries:
            sys.exit(f"unknown query: {q}")

    warmup_dir = os.path.join(os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001")

    if args.plans:
        PLANS_DIR.mkdir(parents=True, exist_ok=True)
        for name in args.queries:
            df = queries[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = PLANS_DIR / f"{name}_{args.plans}.txt"
            path.write_text(buf.getvalue().rstrip() + "\n")
            print(f"wrote {path}", file=sys.stderr)

    if args.time:
        bench.SF_DIR = args.sf_dir  # _optimize_layout reads the module global
        if args.raw_layout:
            timed_dir, opt_sec = args.sf_dir, 0.0
        else:
            timed_dir, opt_sec = bench._optimize_layout(spark)
        from amazon_books_review_spark.streaming.queries import prestage_inputs

        prestage_inputs(spark, timed_dir)
        print(f"relayout {opt_sec}s -> {timed_dir}", file=sys.stderr)
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"r20-opt warmup {name}")
            bench._run_one(spark, queries[name], warmup_dir)
            shots = []
            for i in range(args.reps):
                spark.sparkContext.setJobDescription(f"r20-opt {name} rep{i}")
                secs, err = bench._run_one(spark, queries[name], timed_dir)
                if err is not None:
                    shots.append(err)
                    break
                shots.append(secs)
            ok = [s for s in shots if isinstance(s, float)]
            print(json.dumps({
                "query": name,
                "min": min(ok) if ok else None,
                "shots": shots,
            }))
        if timed_dir != args.sf_dir:
            import shutil

            shutil.rmtree(timed_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

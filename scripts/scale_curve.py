#!/usr/bin/env python3
"""Measure the scale curve of the candidate-bounded operators
(VERDICT r4 #2 / r5 #5): synthesize a ~10x corpus from sf0.1 and run
the bounded paths at both scales.  Near-linear wall-time and output
growth is the pass condition — a super-linear path means a hidden
all-pairs term.

Synthesis preserves the property the claim depends on: each replica
keeps the ORIGINAL's intra-replica near-dup structure while sharing
no similarity across replicas, so true-pair counts scale ~REP, not
REP^2:

- documents: every token is salted per replica (``tok`` -> ``tokxI``),
  so replicas of the same doc share zero shingles across replicas but
  duplicate clusters within a replica are intact.
- embeddings: each replica's vectors are component-ROTATED by the
  replica index — an orthogonal map, so intra-replica cosines are
  exactly preserved while cross-replica cosines of high-dim vectors
  fall to noise.
- lineitem/orders: order keys offset per replica (part/supplier keys
  unchanged — dimension join fan-out stays constant per row).

Usage: python scripts/scale_curve.py [REP]   (default 10)
Emits one JSON line per query per scale plus a markdown table for
PERF.md on stdout.
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SCALED_DIR = f"/tmp/abr_scale{REP}x_{os.getpid()}"
ID_OFFSET = 10_000_000
KEY_OFFSET = 1_000_000_000

#: The candidate-bounded paths under test + the TPC-H heavies whose
#: shuffles must also scale linearly.
QUERIES = [
    "dedup_minhash_lsh",            # candidate pairs == LSH band joins
    "dedup_neardup_lsh_verified",   # candidates + exact verify
    "embedding_neardup_lsh_verified",
    "similarity_ivf_topk",
    "tpch_q9_product_profit",
    "tpch_q18_large_orders",
    "training_shard_manifest",
]


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SCALED_DIR, exist_ok=True)
    passthrough = ["region", "nation", "customer", "supplier", "part", "events"]
    for t in passthrough:
        dst = os.path.join(SCALED_DIR, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE_SF, f"{t}.parquet"), dst)

    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    reps = []
    for i in range(REP):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_OFFSET))
        if i:
            r = r.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}")
            )
        reps.append(r)
    functools.reduce(lambda a, b: a.unionByName(b), reps).write.mode(
        "overwrite"
    ).parquet(f"{SCALED_DIR}/documents.parquet")

    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    reps = []
    for i in range(REP):
        r = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_OFFSET))
        if i:
            rot = i % dim
            r = r.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ),
            )
        reps.append(r)
    functools.reduce(lambda a, b: a.unionByName(b), reps).write.mode(
        "overwrite"
    ).parquet(f"{SCALED_DIR}/embeddings.parquet")

    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        reps = [
            df.withColumn(key, F.col(key) + F.lit(i * KEY_OFFSET))
            for i in range(REP)
        ]
        functools.reduce(lambda a, b: a.unionByName(b), reps).write.mode(
            "overwrite"
        ).parquet(f"{SCALED_DIR}/{t}.parquet")


def main() -> None:
    from amazon_books_review_spark.session import get_session
    from amazon_books_review_spark.plans.catalog import all_queries

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        app_name="abr-scale-curve",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    synthesize(spark)
    results: dict[str, dict[str, dict[str, float]]] = {}
    try:
        for name in QUERIES:
            fn = queries[name]
            # warm codegen/committer at sf0.001 so one-shot costs stay
            # out of both timed points (same methodology as bench.py)
            fn(spark, BASE_SF.replace("sf0.1", "sf0.001")).write.format(
                "noop"
            ).mode("overwrite").save()
            row = {}
            for label, d in (("1x", BASE_SF), (f"{REP}x", SCALED_DIR)):
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                row[label] = {
                    "sec": round(time.perf_counter() - t0, 3),
                    "rows": n,
                }
            results[name] = row
            print(json.dumps({"query": name, **row}), flush=True)
    finally:
        shutil.rmtree(SCALED_DIR, ignore_errors=True)
        spark.stop()

    big = f"{REP}x"
    print("\n| query | 1x sec | %sx sec | time ratio | 1x rows | %sx rows | row ratio |" % (REP, REP))
    print("|---|---|---|---|---|---|---|")
    for name, row in results.items():
        tr = row[big]["sec"] / max(row["1x"]["sec"], 1e-9)
        rr = row[big]["rows"] / max(row["1x"]["rows"], 1)
        print(
            f"| {name} | {row['1x']['sec']} | {row[big]['sec']} | "
            f"{tr:.2f}x | {row['1x']['rows']} | {row[big]['rows']} | {rr:.2f}x |"
        )


if __name__ == "__main__":
    main()

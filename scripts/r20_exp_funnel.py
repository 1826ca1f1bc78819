#!/usr/bin/env python3
"""EXP5 (r20 opt): corpus_filter_funnel fused single-scan form (HEAD)
vs the r19 composed form (3 scoring scans + 2 doc-grain joins),
interleaved in one session; plus kcenter_coreset HEAD (one Arrow
fetch) vs the distributed K-round loop (forced via the cap conf)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

import bench
from amazon_books_review_spark.functions.text import gopher_quality_flags
from amazon_books_review_spark.plans.scale_ops_queries import (
    KC_ARROW_MAX_ROWS_CONF,
    kcenter_coreset,
)
from amazon_books_review_spark.plans.selection_queries import (
    char_entropy_quality,
    corpus_filter_funnel,
    quality_logistic_score,
)
from amazon_books_review_spark.sources.io import load_table
from amazon_books_review_spark.session import get_session


def funnel_r19(spark, sf_dir):
    """The r19 composed form, verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    g = gopher_quality_flags(docs, "doc_id", "text").select(
        "doc_id", F.col("keep").alias("g_keep")
    )
    e = char_entropy_quality(spark, sf_dir).select(
        "doc_id", (~F.col("low_entropy")).alias("e_keep")
    )
    q = quality_logistic_score(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    j = g.join(e, "doc_id").join(q, "doc_id")
    agg = j.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((~F.col("e_keep")).cast("long")).alias("k1"),
        F.sum((F.col("e_keep") & ~F.col("q_keep")).cast("long")).alias("k2"),
        F.sum(
            (F.col("e_keep") & F.col("q_keep") & ~F.col("g_keep")).cast("long")
        ).alias("k3"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("long").alias("stage_order"),
                    F.lit("entropy_floor").alias("stage"),
                    F.col("n0").alias("n_in"),
                    F.col("k1").alias("n_killed"),
                    (F.col("n0") - F.col("k1")).alias("n_out"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("stage_order"),
                    F.lit("logistic_cutoff").alias("stage"),
                    (F.col("n0") - F.col("k1")).alias("n_in"),
                    F.col("k2").alias("n_killed"),
                    (F.col("n0") - F.col("k1") - F.col("k2")).alias("n_out"),
                ),
                F.struct(
                    F.lit(3).cast("long").alias("stage_order"),
                    F.lit("gopher_rules").alias("stage"),
                    (F.col("n0") - F.col("k1") - F.col("k2")).alias("n_in"),
                    F.col("k3").alias("n_killed"),
                    (F.col("n0") - F.col("k1") - F.col("k2") - F.col("k3")).alias(
                        "n_out"
                    ),
                ),
            )
        ).alias("s")
    ).select("s.stage_order", "s.stage", "s.n_in", "s.n_killed", "s.n_out")


def kcenter_distributed(spark, sf_dir):
    spark.conf.set(KC_ARROW_MAX_ROWS_CONF, "0")
    try:
        return kcenter_coreset(spark, sf_dir)
    finally:
        spark.conf.unset(KC_ARROW_MAX_ROWS_CONF)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="abr-r20-exp-funnel",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    timed_dir, _ = bench._optimize_layout(spark)
    warmup = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    a = corpus_filter_funnel(spark, warmup).toPandas().sort_values("stage_order")
    b = funnel_r19(spark, warmup).toPandas().sort_values("stage_order")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True)), "funnel mismatch"
    print("value identity OK at sf0.001", file=sys.stderr)

    variants = {
        "funnel_fused": corpus_filter_funnel,
        "funnel_r19": funnel_r19,
        "kcenter_arrow": kcenter_coreset,
        "kcenter_dist": kcenter_distributed,
    }
    shots: dict[str, list[float]] = {k: [] for k in variants}
    rounds = int(os.environ.get("R20_EXP_ROUNDS", "5"))
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"r20-exp-funnel {name} round{r}")
            t0 = time.time()
            fn(spark, timed_dir).write.format("noop").mode("overwrite").save()
            shots[name].append(round(time.time() - t0, 3))
    for name, ss in shots.items():
        print(json.dumps({"variant": name, "min": min(ss), "median": sorted(ss)[len(ss) // 2], "shots": ss}))
    import shutil

    shutil.rmtree(timed_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""EXP4 (r20 opt): does restoring the r18 ``repartition("src")``
before adamic_adar's edge checkpoint pay, like pagerank's (EXP1) and
label-prop's (EXP3) restorations did?  Here the downstream consumers
are one groupBy("src") degree aggregate, a broadcast cap join probed
on src, and the wedge self-join (AQE-broadcast at test SF) — less
per-iteration leverage than pagerank's five rounds, so the answer is
not assumed."""

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
from amazon_books_review_spark.plans.graph_queries import (
    AA_TOP,
    AA_WEIGHTS,
    adamic_adar_linkpred,
)
from amazon_books_review_spark.plans.scale_ops_queries import copurchase_edges
from amazon_books_review_spark.operators.windows import global_top_k
from amazon_books_review_spark.sources.io import load_table
from amazon_books_review_spark.session import get_session


def _aa_scores_repart(adj):
    adj = adj.repartition("src").localCheckpoint(eager=True)
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(AA_WEIGHTS.items()) for x in kv]
    )
    hubs = deg.select("src", F.element_at(wmap, F.col("deg")).alias("wv")).filter(
        F.col("wv").isNotNull()
    )
    capped = adj.join(F.broadcast(hubs), "src").localCheckpoint(eager=True)
    a, b = capped.alias("a"), capped.alias("b")
    scored = (
        a.join(b, "src")
        .filter(F.col("a.dst") < F.col("b.dst"))
        .select(
            F.col("a.dst").alias("u"),
            F.col("b.dst").alias("v"),
            F.col("a.wv").alias("wv"),
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("wv").cast("long").alias("score_units"),
        )
    )
    und = adj.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return scored.join(und, ["u", "v"], "left_anti")


def adamic_repart(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    fresh = _aa_scores_repart(copurchase_edges(li, directed=True))
    top = global_top_k(
        fresh,
        [F.col("score_units").desc(), F.col("u").asc(), F.col("v").asc()],
        AA_TOP,
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        F.col("score_units").desc(), F.col("u").asc(), F.col("v").asc()
    )
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("u", "v", "n_common", "score_units", "rnk")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="abr-r20-exp-adamic",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    timed_dir, _ = bench._optimize_layout(spark)
    warmup = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    variants = {
        "adamic_HEAD": adamic_adar_linkpred,
        "adamic_repart": adamic_repart,
    }
    a = adamic_adar_linkpred(spark, warmup).toPandas().sort_values("rnk")
    b = adamic_repart(spark, warmup).toPandas().sort_values("rnk")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True)), "mismatch"
    print("value identity OK at sf0.001", file=sys.stderr)

    shots: dict[str, list[float]] = {k: [] for k in variants}
    rounds = int(os.environ.get("R20_EXP_ROUNDS", "5"))
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"r20-exp-adamic {name} round{r}")
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

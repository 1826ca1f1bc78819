#!/usr/bin/env python3
"""EXP7 (r20 opt): collapse label-prop's per-round TWO exchanges into
one.  Each round runs groupBy(src,lbl).count -> groupBy(src).argmax:
Exchange(hash(src,lbl)) + Exchange(hash(src)).  HashPartitioning(src)
satisfies ClusteredDistribution for BOTH groupings (src is a subset of
{src,lbl}), so `repartition("src")` before the first aggregate lets
both ride one exchange.  Trade-off measured, not assumed: the single
exchange ships edge-grain rows un-aggregated, where the old first
exchange shipped (src,lbl) map-side partials — on near-distinct
(src,lbl) pairs the partials don't compress, so the single exchange
should win; on converged rounds (many shared labels) it could lose."""

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
from amazon_books_review_spark.operators.joins import broadcast_if_small
from amazon_books_review_spark.plans.graph_queries import (
    LP_ITERS,
    label_propagation_communities,
)
from amazon_books_review_spark.plans.scale_ops_queries import copurchase_edges
from amazon_books_review_spark.sources.io import load_table
from amazon_books_review_spark.session import get_session


def _propagate_1ex(edges, iters=LP_ITERS, cluster_dst=True):
    edges = (edges.repartition("dst") if cluster_dst else edges).localCheckpoint(eager=True)
    labels = None
    n_nodes = None
    for _ in range(iters):
        if labels is None:
            joined = edges.select("src", F.col("dst").alias("lbl"))
        else:
            joined = edges.join(
                broadcast_if_small(labels, n_nodes),
                edges["dst"] == labels["node"],
            )
        adopted = (
            joined
            .repartition("src")  # one exchange serves BOTH aggregates
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("src")
            .agg(
                F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("neg")))
                .alias("best")
            )
            .select(
                F.col("src").alias("node"),
                (-F.col("best.neg")).alias("lbl"),
            )
        )
        labels = adopted.localCheckpoint(eager=True)
        if n_nodes is None:
            n_nodes = labels.count()
    return labels


def labelprop_1ex(spark, sf_dir, cluster_dst=True):
    li = load_table(spark, sf_dir, "lineitem")
    labels = _propagate_1ex(copurchase_edges(li, directed=True), cluster_dst=cluster_dst)
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return labels.join(F.broadcast(sizes), "lbl").select(
        F.col("node").alias("p_partkey"),
        F.col("lbl").alias("community"),
        "community_size",
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="abr-r20-exp-lp1ex",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    timed_dir, _ = bench._optimize_layout(spark)
    warmup = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    # plan check first: the 1ex round must really have one Exchange pair
    import contextlib
    import io

    la = label_propagation_communities(spark, warmup).toPandas().sort_values(
        ["p_partkey"]
    )
    lb = labelprop_1ex(spark, warmup).toPandas().sort_values(["p_partkey"])
    assert la.reset_index(drop=True).equals(lb.reset_index(drop=True)), "mismatch"
    print("value identity OK at sf0.001", file=sys.stderr)

    variants = {
        "labelprop_HEAD": label_propagation_communities,
        "labelprop_1ex": labelprop_1ex,
        "labelprop_1ex_noclust": lambda s, d: labelprop_1ex(s, d, cluster_dst=False),
    }
    shots: dict[str, list[float]] = {k: [] for k in variants}
    rounds = int(os.environ.get("R20_EXP_ROUNDS", "6"))
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"r20-exp-lp1ex {name} round{r}")
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

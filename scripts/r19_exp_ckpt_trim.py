#!/usr/bin/env python3
"""EXP (r19 opt): are the per-iteration eager localCheckpoints of
SINGLE-USE rank/label tables worth their materialize actions?

pagerank_copurchase checkpoints `ranks` every iteration and
label_propagation checkpoints `labels` every round, but each of those
frames is consumed exactly ONCE (the next iteration's broadcast
build) — Catalyst evaluates the subtree once either way, so the
checkpoint buys only lineage truncation at the price of one blocking
job + block write per round.  This experiment times the current form
(A) against a trim that checkpoints only what is genuinely multi-use
(B), INTERLEAVED in one session (the box drifts ~2x within a session
today, so back-to-back block timing is the only honest comparison).

Result identity: B is the same computation with the same
deterministic operators; the oracle comparison stays with the tests.
"""

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
from amazon_books_review_spark.operators.windows import global_top_k
from amazon_books_review_spark.plans.scale_ops_queries import (
    PR_ITERS,
    PR_SCALE,
    PR_TOP,
    copurchase_edges,
    pagerank_copurchase,
)
from amazon_books_review_spark.plans.graph_queries import (
    LP_ITERS,
    label_propagation_communities,
)
from amazon_books_review_spark.sources.io import load_table
from amazon_books_review_spark.session import get_session


def pagerank_trim(spark, sf_dir):
    """pagerank_copurchase with the per-iteration rank checkpoints
    removed (ranks are single-use; edges/nodes stay checkpointed —
    they are consumed 5x / 2x)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, directed=True)
    w_deg = Window.partitionBy("src")
    edges_deg = (
        edges.withColumn("deg", F.count(F.lit(1)).over(w_deg))
        .localCheckpoint(eager=True)
    )
    nodes = edges_deg.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n_nodes = nodes.count()
    init = PR_SCALE // n_nodes
    base = (15 * init) // 100
    ranks = nodes.withColumn("r", F.lit(init))
    for _ in range(PR_ITERS):
        contrib = edges_deg.join(
            broadcast_if_small(ranks, n_nodes),
            edges_deg["src"] == ranks["node"],
        ).select("dst", F.expr("r div deg").alias("c"))
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("recv"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.expr("(85 * recv) div 100")).alias("r"),
            )
        )
    from pyspark.sql import Window as W2

    top = global_top_k(ranks, [F.col("r").desc(), F.col("node").asc()], PR_TOP)
    w = W2.orderBy(F.col("r").desc(), F.col("node").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.col("node").alias("p_partkey"),
        F.col("r").alias("rank_units"),
        "rnk",
    )


def labelprop_trim(spark, sf_dir):
    """label_propagation with intermediate round checkpoints removed
    (round-i labels are single-use; the FINAL labels stay checkpointed
    — consumed by the sizes agg AND the final join)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, directed=True).localCheckpoint(eager=True)
    labels = None
    n_nodes = edges.select("src").distinct().count()
    for i in range(LP_ITERS):
        if labels is None:
            joined = edges.select("src", F.col("dst").alias("lbl"))
        else:
            joined = edges.join(
                broadcast_if_small(labels, n_nodes),
                edges["dst"] == labels["node"],
            )
        adopted = (
            joined
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
        labels = adopted
        if i == LP_ITERS - 1:
            labels = labels.localCheckpoint(eager=True)
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
        app_name="abr-r19-exp-ckpt",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    timed_dir, _ = bench._optimize_layout(spark)
    warmup = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    variants = {
        "pagerank_A": pagerank_copurchase,
        "pagerank_B": pagerank_trim,
        "labelprop_A": label_propagation_communities,
        "labelprop_B": labelprop_trim,
    }
    # value-identity first (cheap, at warmup SF)
    pa = pagerank_copurchase(spark, warmup).toPandas().sort_values("rnk")
    pb = pagerank_trim(spark, warmup).toPandas().sort_values("rnk")
    assert pa.reset_index(drop=True).equals(pb.reset_index(drop=True)), "pagerank mismatch"
    la = label_propagation_communities(spark, warmup).toPandas().sort_values("p_partkey")
    lb = labelprop_trim(spark, warmup).toPandas().sort_values("p_partkey")
    assert la.reset_index(drop=True).equals(lb.reset_index(drop=True)), "labelprop mismatch"
    print("value identity OK at sf0.001", file=sys.stderr)

    shots: dict[str, list[float]] = {k: [] for k in variants}
    rounds = 5
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"exp-ckpt {name} round{r}")
            t0 = time.time()
            fn(spark, timed_dir).write.format("noop").mode("overwrite").save()
            shots[name].append(round(time.time() - t0, 3))
    for name, ss in shots.items():
        print(json.dumps({"variant": name, "min": min(ss), "shots": ss}))
    import shutil

    shutil.rmtree(timed_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

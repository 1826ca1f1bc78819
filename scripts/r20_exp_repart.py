#!/usr/bin/env python3
"""EXP2 (r20 opt): adjudicate the checkpoint-block CLUSTERING effect.

EXP1 (r20_exp_regressions) showed the r18 pagerank (with
``repartition("dst")`` before the edge checkpoint) beats HEAD by ~25%
interleaved — the r19 removal rationale ("localCheckpoint scans back
as UnknownPartitioning, so the exchange bought nothing") missed that
the BLOCK CLUSTERING survives even though the partitioning metadata
does not: the per-iteration ``groupBy("dst")`` partial aggregation
compresses to ~|nodes|/P rows per map task over dst-clustered blocks,
vs ~|nodes| rows per task (every dst present in every task) over the
window's src-clustered blocks — P× the exchanged rows, every
iteration.

Variants:
- pagerank_r18     — EXP1 winner (repartition + distinct counted twice)
- pagerank_hybrid  — repartition(dst) + the r19 node-checkpoint seed
- labelprop_HEAD   — current propagate_labels
- labelprop_repart — edges repartition("dst") restored before ckpt
                     (HEAD round-1 elision kept) — here the join is
                     broadcast and the agg key is (src,lbl), so the
                     clustering argument predicts NO win; measured to
                     close the question rather than assume.
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
)
from amazon_books_review_spark.plans.graph_queries import (
    LP_ITERS,
    label_propagation_communities,
)
from amazon_books_review_spark.sources.io import load_table
from amazon_books_review_spark.session import get_session
from scripts.r20_exp_regressions import pagerank_r18


def pagerank_hybrid(spark, sf_dir):
    """repartition("dst") restored + the r19 checkpointed-nodes seed."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, directed=True)
    w_deg = Window.partitionBy("src")
    edges_deg = (
        edges.withColumn("deg", F.count(F.lit(1)).over(w_deg))
        .repartition("dst")
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
            .localCheckpoint(eager=True)
        )
    from pyspark.sql import Window as W2

    top = global_top_k(ranks, [F.col("r").desc(), F.col("node").asc()], PR_TOP)
    w = W2.orderBy(F.col("r").desc(), F.col("node").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.col("node").alias("p_partkey"),
        F.col("r").alias("rank_units"),
        "rnk",
    )


def _propagate_repart(edges, iters=LP_ITERS, key="dst"):
    edges = edges.repartition(key).localCheckpoint(eager=True)
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


def labelprop_repart(spark, sf_dir, key="dst"):
    li = load_table(spark, sf_dir, "lineitem")
    labels = _propagate_repart(copurchase_edges(li, directed=True), key=key)
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
        app_name="abr-r20-exp-repart",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    timed_dir, _ = bench._optimize_layout(spark)
    warmup = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    variants = {
        "pagerank_r18": pagerank_r18,
        "pagerank_hybrid": pagerank_hybrid,
        "labelprop_HEAD": label_propagation_communities,
        "labelprop_repart": labelprop_repart,
        "labelprop_repart_src": lambda s, d: labelprop_repart(s, d, key="src"),
    }
    pa = pagerank_r18(spark, warmup).toPandas().sort_values("rnk")
    pb = pagerank_hybrid(spark, warmup).toPandas().sort_values("rnk")
    assert pa.reset_index(drop=True).equals(pb.reset_index(drop=True)), "pagerank mismatch"
    la = label_propagation_communities(spark, warmup).toPandas().sort_values("p_partkey")
    lb = labelprop_repart(spark, warmup).toPandas().sort_values("p_partkey")
    assert la.reset_index(drop=True).equals(lb.reset_index(drop=True)), "labelprop mismatch"
    print("value identity OK at sf0.001", file=sys.stderr)

    shots: dict[str, list[float]] = {k: [] for k in variants}
    rounds = int(os.environ.get("R20_EXP_ROUNDS", "5"))
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"r20-exp-repart {name} round{r}")
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

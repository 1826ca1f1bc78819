#!/usr/bin/env python3
"""EXP6 (r20 opt): does the block-clustering lesson (PERF.md r20 #1)
transfer to connected_components' label-prop loop?  The per-round
aggregate is groupBy("node"=src) over sym ∪ labels; clustering the
checkpointed sym by src should compress each round's partial
aggregation the same way pagerank's dst clustering did.  Measured on
the two headline consumers (dedup_cluster_canonical via text near-dup
pairs, dedup_clusters) rather than synthetically."""

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
from amazon_books_review_spark.functions import dedup
from amazon_books_review_spark.operators.joins import broadcast_if_small
from amazon_books_review_spark.plans.catalog import all_queries
from amazon_books_review_spark.session import get_session

_ORIG_CC = dedup.connected_components


def _cc_repart(pairs, id_a="id_a", id_b="id_b", max_iter=20, algorithm="label_prop"):
    """connected_components with the sym checkpoint clustered by src."""
    if algorithm != "label_prop":
        return _ORIG_CC(pairs, id_a, id_b, max_iter, algorithm)
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    sym = sym.repartition("src").localCheckpoint()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()
    n_nodes = labels.count()
    changed = None
    for _ in range(max_iter):
        lb = broadcast_if_small(labels, n_nodes)
        nbr_labels = sym.join(
            lb, sym["dst"] == lb["node"]
        ).select(F.col("src").alias("node"), F.col("label"))
        old = broadcast_if_small(
            labels.select("node", F.col("label").alias("old_label")), n_nodes
        )
        merged = (
            labels.select("node", "label")
            .unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
            .join(old, "node")
            .select(
                "node",
                F.col("new_label").alias("label"),
                (F.col("new_label") != F.col("old_label")).cast("long").alias("ch"),
            )
            .localCheckpoint()
        )
        changed = merged.agg(F.sum("ch")).first()[0]
        labels = merged.select("node", "label")
        if not changed:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="abr-r20-exp-cc",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    timed_dir, _ = bench._optimize_layout(spark)
    warmup = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    qs = all_queries()

    targets = ["dedup_cluster_canonical", "dedup_clusters"]

    def run_variant(name, repart):
        dedup.connected_components = _cc_repart if repart else _ORIG_CC
        try:
            t0 = time.time()
            qs[name](spark, timed_dir).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)
        finally:
            dedup.connected_components = _ORIG_CC

    # value identity at warmup SF
    for name in targets:
        dedup.connected_components = _ORIG_CC
        a = qs[name](spark, warmup).toPandas()
        dedup.connected_components = _cc_repart
        b = qs[name](spark, warmup).toPandas()
        dedup.connected_components = _ORIG_CC
        cols = sorted(a.columns)
        assert (
            a[cols].sort_values(cols).reset_index(drop=True)
            .equals(b[cols].sort_values(cols).reset_index(drop=True))
        ), f"{name} mismatch"
    print("value identity OK at sf0.001", file=sys.stderr)

    shots = {f"{n}_{v}": [] for n in targets for v in ("HEAD", "repart")}
    rounds = int(os.environ.get("R20_EXP_ROUNDS", "5"))
    for r in range(rounds):
        for name in targets:
            for v, repart in (("HEAD", False), ("repart", True)):
                spark.sparkContext.setJobDescription(f"r20-exp-cc {name} {v} round{r}")
                shots[f"{name}_{v}"].append(run_variant(name, repart))
    for k, ss in shots.items():
        print(json.dumps({"variant": k, "min": min(ss), "median": sorted(ss)[len(ss) // 2], "shots": ss}))
    import shutil

    shutil.rmtree(timed_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

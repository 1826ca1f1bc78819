#!/usr/bin/env python3
"""EXP (r20 opt): resolve VERDICT r19's three robust regressions with
interleaved same-session A/Bs (the box drifts ~2x within a day, so
cross-run comparisons cannot adjudicate them).

1. pagerank_copurchase 2.62 (r18 driver) -> 5.20/3.35 (r19 driver
   c32/c8).  A = HEAD (r19: dead repartition("dst") removed, nodes
   checkpointed); B = the r18 shape reconstructed (repartition("dst")
   before the edge checkpoint, n_nodes via distinct().count(), ranks
   derived without the node checkpoint).
2. embedding_semdedup_clusters 2.11 -> 3.33/2.65.  A = HEAD (r19 star
   loop: size-adaptive ls checkpoint, count carry-forward, left-anti
   containment); B = the r18 star loop (re-count both sides per round,
   subtract-based containment) on the same upstream mutual edges.
3. streaming_stream_stream_join_salted 2.43 -> 3.45/2.95 (untouched
   in r19).  No alternate shape exists; A/B = salted vs unsalted
   (the skew-hardening surcharge), interleaved, to separate operator
   cost from session drift.

Usage: SPARK_GRAFT_CPUS=32 python scripts/r20_exp_regressions.py
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
from amazon_books_review_spark.functions import dedup
from amazon_books_review_spark.operators.joins import broadcast_if_small
from amazon_books_review_spark.operators.windows import global_top_k
from amazon_books_review_spark.plans.scale_ops_queries import (
    PR_ITERS,
    PR_SCALE,
    PR_TOP,
    copurchase_edges,
    pagerank_copurchase,
)
from amazon_books_review_spark.plans.northstar_queries import (
    COSINE_DUP_THRESHOLD,
    embedding_semdedup_clusters,
    similarity_lsh_knngraph_mutual,
)
from amazon_books_review_spark.sources.io import load_table
from amazon_books_review_spark.session import get_session


def pagerank_r18(spark, sf_dir):
    """The r18 shape: repartition("dst") before the edge checkpoint,
    no separate node checkpoint (n_nodes via distinct().count())."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, directed=True)
    w_deg = Window.partitionBy("src")
    edges_deg = (
        edges.withColumn("deg", F.count(F.lit(1)).over(w_deg))
        .repartition("dst")
        .localCheckpoint(eager=True)
    )
    n_nodes = edges_deg.select("src").distinct().count()
    init = PR_SCALE // n_nodes
    base = (15 * init) // 100
    ranks = (
        edges_deg.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("r", F.lit(init))
    )
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


def pagerank_degjoin(spark, sf_dir):
    """Candidate shape: degree via groupBy (map-side partial agg —
    shuffles (src, count) partials instead of the window's full edge
    exchange + sort) broadcast-joined back onto the checkpointed edge
    set; the node-sized deg table doubles as the node table."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, directed=True).localCheckpoint(eager=True)
    deg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    n_nodes = deg.count()
    edges_deg = edges.join(broadcast_if_small(deg, n_nodes), "src")
    init = PR_SCALE // n_nodes
    base = (15 * init) // 100
    ranks = deg.select(F.col("src").alias("node"), F.lit(init).alias("r"))
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


def _cc_star_r18(pairs, id_a="id_a", id_b="id_b", max_iter=30):
    """connected_components_star with the r18 loop body (two count
    jobs per round, subtract containment, unconditional per-round
    checkpoint of small_star output only)."""
    raw = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    edges = (
        raw.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )

    def large_star(e):
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = sym.groupBy("src").agg(F.min("dst").alias("_min_nbr"))
        m = F.least(F.col("_min_nbr"), F.col("src")).alias("m")
        with_m = sym.join(mins, "src").select("src", "dst", m)
        return (
            with_m.filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    def small_star(e):
        mins = e.groupBy("src").agg(F.min("dst").alias("m"))
        joined = e.join(mins, "src")
        return (
            joined.filter(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(mins.select("src", F.col("m").alias("dst")))
            .distinct()
        )

    for _ in range(max_iter):
        new_edges = small_star(large_star(edges)).localCheckpoint()
        same = (
            new_edges.count() == edges.count()
            and new_edges.subtract(edges).limit(1).count() == 0
        )
        edges = new_edges
        if same:
            break
    roots = edges.select(F.col("dst").alias("node")).distinct()
    return (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("cluster_id"))
        .unionByName(roots.select("node", F.col("node").alias("cluster_id")))
        .groupBy("node")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def semdedup_clusters_r18(spark, sf_dir):
    edges = similarity_lsh_knngraph_mutual(spark, sf_dir).filter(
        F.col("sim") >= COSINE_DUP_THRESHOLD
    )
    return _cc_star_r18(edges).select(
        F.col("node").alias("vec_id"), "cluster_id"
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app_name="abr-r20-exp-regr",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.SF_DIR = sf_dir
    timed_dir, _ = bench._optimize_layout(spark)
    warmup = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    from amazon_books_review_spark.streaming.queries import (
        prestage_inputs,
        streaming_stream_stream_join,
        streaming_stream_stream_join_salted,
    )

    prestage_inputs(spark, timed_dir)

    variants = {
        "pagerank_HEAD": pagerank_copurchase,
        "pagerank_r18": pagerank_r18,
        "pagerank_degjoin": pagerank_degjoin,
        "semclusters_HEAD": embedding_semdedup_clusters,
        "semclusters_r18": semdedup_clusters_r18,
        "ssj_salted": streaming_stream_stream_join_salted,
        "ssj_unsalted": streaming_stream_stream_join,
    }
    # value-identity first (cheap, at warmup SF)
    pa = pagerank_copurchase(spark, warmup).toPandas().sort_values("rnk")
    for alt in (pagerank_r18, pagerank_degjoin):
        pb = alt(spark, warmup).toPandas().sort_values("rnk")
        assert pa.reset_index(drop=True).equals(
            pb.reset_index(drop=True)
        ), f"pagerank mismatch: {alt.__name__}"
    ca = embedding_semdedup_clusters(spark, warmup).toPandas().sort_values("vec_id")
    cb = semdedup_clusters_r18(spark, warmup).toPandas().sort_values("vec_id")
    assert ca.reset_index(drop=True).equals(cb.reset_index(drop=True)), "clusters mismatch"
    print("value identity OK at sf0.001", file=sys.stderr)

    shots: dict[str, list[float]] = {k: [] for k in variants}
    rounds = int(os.environ.get("R20_EXP_ROUNDS", "5"))
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"r20-exp-regr {name} round{r}")
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

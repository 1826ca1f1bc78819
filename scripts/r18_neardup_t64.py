"""r18: the LIFTED-CEILING re-certification measurement (VERDICT r17
#4).  test_lifting_max_tables_recertifies_past_the_local_clamp pins
the DERIVATION — at a cluster-scale table budget (max_tables=64) the
same adaptive plan certifies b=15 with (T=37, pb=2) and b=16 with
(T=52, pb=2), exactly the decades the local T=32 clamp marks
degraded (measured r17: 89.7% at 1M / 81.0% at 2M).  This script
converts that identity into a MEASURED artifact: same fixture, seed,
and 2000-probe stratum as scripts/r17_neardup_scale.py, but sized by
the lifted plan, so the acceptance is measured recall >= the 90%
derivation target (85 target + 5 margin) where the clamped run fell
short.

The exact sampled arm is seed-deterministic, so it is CACHED to
parquet per (N, N_SAMPLE) — the T=64 re-run pays only the LSH arm
(wall scales ~T/32 over the r17 run, which is the point: recall is
bought with tables, linearly in cost, once the budget allows it).

Usage: python scripts/r18_neardup_t64.py OUT.json [N] [MAX_TABLES]
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from amazon_books_review_spark import session
from amazon_books_review_spark.functions import similarity
from amazon_books_review_spark.plans import northstar_queries as nq

N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
MAX_TABLES = int(sys.argv[3]) if len(sys.argv) > 3 else 64
N_SAMPLE = 2000
SEED = 4242
EMB_DIR = f"/tmp/abr_emb_{N}"
path = os.path.join(EMB_DIR, "embeddings.parquet")
if not os.path.exists(path):
    os.makedirs(EMB_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    vecs = rng.normal(size=(N, nq.EMB_DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(
        pa.table({
            "vec_id": np.arange(N, dtype=np.int64),
            "embedding": pa.array(
                vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
            "label": rng.integers(0, 10, N).astype(np.int32),
        }),
        path,
        row_group_size=max(1, N // 32),
    )

spark = session.get_session(
    app_name="abr-r18-neardup-t64",
    master="local[32]",
    shuffle_partitions=64,
    extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(path)
n = emb.count()
nb = similarity.lsh_planes_for(
    n, nq.NEARDUP_LSH_OCC,
    min_planes=nq.NEARDUP_LSH_MIN_PLANES, max_planes=nq.NEARDUP_LSH_MAX_PLANES,
)
lifted = similarity.lsh_adaptive_plan(
    nq.COSINE_DUP_THRESHOLD,
    nq.NEARDUP_LSH_TARGET_RECALL_PCT + nq.NEARDUP_LSH_DERIVATION_MARGIN_PCT,
    base_probe_bits=1, max_probe_bits=2,
    min_planes=nq.NEARDUP_LSH_MIN_PLANES,
    max_planes=nq.NEARDUP_LSH_MAX_PLANES,
    max_tables=MAX_TABLES,
)
nt, npb = similarity.lsh_plan_checked(lifted, nb)
clamped = lifted.by_b[nb][2]
per_table = similarity.lsh_probe_hit_rate(nq.COSINE_DUP_THRESHOLD, nb, npb)
predicted = 100.0 * (1.0 - (1.0 - per_table) ** nt)
print(f"n={n} b={nb} T={nt} pb={npb} clamped={clamped} "
      f"(max_tables={MAX_TABLES}) predicted={predicted:.1f}%", flush=True)

# exact arm, sampled + CACHED (deterministic in (SEED, N, N_SAMPLE))
exact_path = f"/tmp/abr_exact_{N}_{N_SAMPLE}"
t0 = time.time()
if os.path.exists(os.path.join(exact_path, "_SUCCESS")):
    exact = spark.read.parquet(exact_path)
    exact_sec = 0.0
    exact_cached = True
else:
    sml = emb.filter(F.col("vec_id") < N_SAMPLE)
    va = sml.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    vb = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    ).repartition(64)
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    nrm = "sqrt(aggregate({c}, 0D, (a, v) -> a + v * v))"
    (
        va.crossJoin(vb)
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("lo", F.least("id_a", "id_b"))
        .filter(F.col("id_a") == F.col("lo"))
        .withColumn(
            "sim",
            F.round(
                F.expr(dot)
                / (F.expr(nrm.format(c="ea")) * F.expr(nrm.format(c="eb"))),
                6,
            ),
        )
        .filter(F.col("sim") >= nq.COSINE_DUP_THRESHOLD)
        .select("id_a", "id_b")
        .write.mode("overwrite").parquet(exact_path)
    )
    exact = spark.read.parquet(exact_path)
    exact_sec = round(time.time() - t0, 2)
    exact_cached = False
exact.persist()
n_exact = exact.count()
print(f"exact(sampled) pairs={n_exact} in {exact_sec}s"
      f" (cached={exact_cached})", flush=True)

t0 = time.time()
if npb == 2:
    lsh_sampled = similarity.cosine_neardup_lsh_verified(
        emb, "vec_id", "embedding",
        threshold=nq.COSINE_DUP_THRESHOLD,
        n_planes=nb, n_tables=nt, dim=nq.EMB_DIM,
        probe_bits=2, probes=emb.filter(F.col("vec_id") < N_SAMPLE),
    ).select("id_a", "id_b")
else:
    lsh_sampled = similarity.cosine_neardup_lsh_verified(
        emb, "vec_id", "embedding",
        threshold=nq.COSINE_DUP_THRESHOLD,
        n_planes=nb, n_tables=nt, dim=nq.EMB_DIM, probe_bits=npb,
    ).select("id_a", "id_b").filter(F.col("id_a") < N_SAMPLE)
n_hit = exact.join(lsh_sampled, ["id_a", "id_b"]).count()
lsh_sec = round(time.time() - t0, 2)

out = {
    "n_vectors": n, "derived_planes": nb, "n_tables": nt,
    "probe_bits": npb, "max_tables": MAX_TABLES,
    "table_clamp_binds": bool(clamped),
    "n_sample_probes": N_SAMPLE,
    "n_exact_sampled": n_exact, "n_hit": n_hit,
    "recall_pct": round(100 * n_hit / max(1, n_exact), 1),
    "predicted_recall_pct": round(predicted, 1),
    "exact_arm_sec": exact_sec, "exact_arm_cached": exact_cached,
    "lsh_arm_sec": lsh_sec,
    "seed": SEED,
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

"""r17: near-dup sampled recall at the ADAPTIVE probe plan (VERDICT
r16 #1 acceptance run).  Same fixture, seed, and 2000-probe stratum
as scripts/r16_200k_neardup.py, but sizing comes from
``NEARDUP_LSH_PLAN`` (lsh_plan_checked), so past b=10 the tier runs
Hamming-<=2 with its certified table count instead of clamping at
T=32 — at 200k vectors (b=13) that is (T=20, pb=2) where r16 measured
66.6% recall at (32, 1, clamped); at 500k (b=14) it is (27, 2), the
decade point VERDICT r16 #5 asks for.

The lsh arm at pb=2 uses the engine's one-sided radius-2 probe split
(`probes=` subset): the SAME per-table Hamming-<=2 coverage as the
full symmetric form — test_probes_form_equals_self_form pins the
set equality — with bytes proportional to the probe stratum, which is
what a recall audit should cost.  The closed-form prediction next to
the measurement extends the r16 degradation-model validation into the
certified region (acceptance: |measured - predicted| < 10 points).

Usage: python scripts/r17_neardup_scale.py OUT.json [N]
(reuses/creates the standalone fixture from r16_200k_neardup.py)
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

N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
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
    app_name="abr-r17-neardup-scale",
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
nt, npb = similarity.lsh_plan_checked(nq.NEARDUP_LSH_PLAN, nb)
clamped = nq.NEARDUP_LSH_PLAN.by_b[nb][2]

per_table = similarity.lsh_probe_hit_rate(nq.COSINE_DUP_THRESHOLD, nb, npb)
predicted = 100.0 * (1.0 - (1.0 - per_table) ** nt)
print(f"n={n} b={nb} T={nt} pb={npb} clamped={clamped} "
      f"predicted_recall={predicted:.1f}%", flush=True)

# exact arm, sampled: pairs (a, b), a < b, a < N_SAMPLE
sml = emb.filter(F.col("vec_id") < N_SAMPLE)
va = sml.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
vb = emb.select(
    F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
).repartition(64)
dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
nrm = "sqrt(aggregate({c}, 0D, (a, v) -> a + v * v))"
t0 = time.time()
exact = (
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
)
exact.persist()
n_exact = exact.count()
exact_sec = round(time.time() - t0, 2)
print(f"exact(sampled) pairs={n_exact} in {exact_sec}s", flush=True)

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
    "probe_bits": npb, "table_clamp_binds": bool(clamped),
    "n_sample_probes": N_SAMPLE,
    "n_exact_sampled": n_exact, "n_hit": n_hit,
    "recall_pct": round(100 * n_hit / max(1, n_exact), 1),
    "predicted_recall_pct": round(predicted, 1),
    "exact_arm_sec": exact_sec, "lsh_arm_sec": lsh_sec,
    "seed": SEED,
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

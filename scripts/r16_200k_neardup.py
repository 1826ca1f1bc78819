"""r16: third-decade near-dup probe (200k vectors — PAST the b=11
table clamp, by design).

At n=200k the plane derivation reads b=13 and `lsh_tables_by_planes`
clamps T at 32, where the un-clamped derivation would need ~65 tables
for the 85% target at design sim 0.45 — the documented contract is
that past the clamp the tier degrades in AUDIT-VISIBLE RECALL rather
than cost (PERF.md r15 finding 7).  This probe measures that decade
and records the closed-form prediction next to the measurement, so
the capacity model itself is validated in its degradation zone:

    per-table hit  p = p1^b + b*p1^(b-1)*(1-p1),  p1 = 1 - acos(s)/pi
    recall ~ 1 - (1-p)^T

Embeddings are generated standalone (isotropic unit-norm gaussian,
the same distribution scripts/gen_sf.py fits — embeddings are
independent of every other table, so a dedicated seed is fine; the
full generator's single RNG stream would force generating 600M
lineitem rows to reach the embeddings draw).

Usage: python scripts/r16_200k_neardup.py OUT.json [N]
"""
import json
import math
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

os.makedirs(EMB_DIR, exist_ok=True)
path = os.path.join(EMB_DIR, "embeddings.parquet")
if not os.path.exists(path):
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
    app_name="abr-200k-neardup",
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
nt = nq.NEARDUP_LSH_T_BY_B[nb]

# closed-form prediction at the operating point
p1 = 1.0 - math.acos(nq.COSINE_DUP_THRESHOLD) / math.pi
per_table = p1 ** nb + nb * p1 ** (nb - 1) * (1 - p1)
predicted = 100.0 * (1.0 - (1.0 - per_table) ** nt)
print(f"n={n} b={nb} T={nt} predicted_recall={predicted:.1f}%", flush=True)

# exact arm, sampled: pairs (a, b), a < b, min(a, b) < N_SAMPLE
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
lsh = similarity.cosine_neardup_lsh_verified(
    emb, "vec_id", "embedding",
    threshold=nq.COSINE_DUP_THRESHOLD,
    n_planes=nb, n_tables=nt, dim=nq.EMB_DIM,
    probe_bits=nq.NEARDUP_LSH_PROBE_BITS,
).select("id_a", "id_b")
lsh_sampled = lsh.filter(F.col("id_a") < N_SAMPLE)
n_hit = exact.join(lsh_sampled, ["id_a", "id_b"]).count()
lsh_sec = round(time.time() - t0, 2)

out = {
    "n_vectors": n, "derived_planes": nb, "n_tables": nt,
    "table_clamp_binds": True,
    "probe_bits": nq.NEARDUP_LSH_PROBE_BITS,
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

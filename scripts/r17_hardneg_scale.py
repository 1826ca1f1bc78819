"""r17: hard-negative mining recall at wall decades — the third
miner's scale measurement (near-dup and bitext have theirs in
SF*_NEARDUP/SF*_BITEXT artifacts).

Unlike those two, hardneg's EXACT arm is probe-bounded by contract
(broadcast probes x one corpus scan), so the full exact-vs-LSH recall
audit — not a sampled stratum, the per-probe top-k itself — is
computable at ANY corpus size.  This runs the catalog entry's own
derivation (adaptive plan: Hamming-<=2 past b=10) against the exact
tier at a decade of choice, using a larger probe set than the parity
entry's N_PROBES=10 for tighter statistics.

Usage: python scripts/r17_hardneg_scale.py OUT.json [N]
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
N_PROBES = 200
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
    app_name="abr-r17-hardneg-scale",
    master="local[32]",
    shuffle_partitions=64,
    extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(path)
n = emb.count()
nb = similarity.lsh_planes_for(
    n, nq.HARDNEG_LSH_OCC,
    min_planes=nq.HARDNEG_LSH_MIN_PLANES, max_planes=nq.HARDNEG_LSH_MAX_PLANES,
)
nt, npb = similarity.lsh_plan_checked(nq.HARDNEG_LSH_PLAN, nb)
clamped = nq.HARDNEG_LSH_PLAN.by_b[nb][2]
print(f"n={n} b={nb} T={nt} pb={npb} clamped={clamped}", flush=True)

probes = emb.filter(F.col("vec_id") < N_PROBES)

t0 = time.time()
exact = similarity.hard_negatives(
    emb, probes, "vec_id", "embedding", "label",
    k=nq.TOPK_K, max_sim=nq.HARDNEG_MAX_SIM,
).select("query_id", "neighbor_id")
exact.persist()
n_exact = exact.count()
exact_sec = round(time.time() - t0, 2)
print(f"exact: {n_exact} pairs in {exact_sec}s", flush=True)

t0 = time.time()
lsh = similarity.hard_negatives_lsh(
    emb, probes, "vec_id", "embedding", "label",
    dim=nq.EMB_DIM, k=nq.TOPK_K, max_sim=nq.HARDNEG_MAX_SIM,
    n_planes=nb, n_tables=nt, probe_bits=npb,
).select("query_id", "neighbor_id")
n_hit = exact.join(lsh, ["query_id", "neighbor_id"]).count()
lsh_sec = round(time.time() - t0, 2)

out = {
    "n_vectors": n, "derived_planes": nb, "n_tables": nt,
    "probe_bits": npb, "table_clamp_binds": bool(clamped),
    "n_probes": N_PROBES, "k": nq.TOPK_K,
    "n_exact": n_exact, "n_hit": n_hit,
    "recall_pct": round(100 * n_hit / max(1, n_exact), 1),
    "exact_arm_sec": exact_sec, "lsh_arm_sec": lsh_sec,
    "seed": SEED,
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

"""r17: near-dup FULL-CORPUS wall at the ADAPTIVE probe plan — the
companion to scripts/r17_neardup_scale.py, timing the whole tier
through the noop sink at the configuration `embedding_neardup_lsh_
verified` actually derives (past b=10: symmetric radius-1 explode +
per-bucket GEMM; r16's shape at the same 200k decade was (T=32,
Hamming-1, JVM folds) and took 859 s — SF10_NEARDUP_WALL_R16.json —
while reading 66.6% recall; this run is expected to be BOTH faster
(fewer tables, BLAS scoring) and certified).

Usage: python scripts/r17_neardup_wall.py OUT.json [N]
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

from amazon_books_review_spark import session
from amazon_books_review_spark.functions import similarity
from amazon_books_review_spark.plans import northstar_queries as nq

N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
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
    app_name="abr-r17-neardup-wall",
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
print(f"n={n} b={nb} T={nt} pb={npb}", flush=True)

t0 = time.time()
pairs = similarity.cosine_neardup_lsh_verified(
    emb, "vec_id", "embedding",
    threshold=nq.COSINE_DUP_THRESHOLD,
    n_planes=nb, n_tables=nt, dim=nq.EMB_DIM,
    probe_bits=npb,
)
pairs.write.format("noop").mode("overwrite").save()
wall = round(time.time() - t0, 2)
n_pairs = pairs.count()

out = {
    "n_vectors": n, "derived_planes": nb, "n_tables": nt,
    "probe_bits": npb,
    "n_pairs": n_pairs, "wall_sec": wall,
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

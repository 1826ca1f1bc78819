"""r16: near-dup FULL-CORPUS wall at the third decade (200k vectors)
— the companion to scripts/r16_200k_neardup.py (which measures
recall via a 2000-probe stratum whose filter pushes into the probe
side, i.e. a ~1%-of-sources run).  This times the whole tier through
the noop sink, completing the full-entry decade table
(38.6 s at 20 k, BENCH_SF1_R16.json).

Unlike the bitext miner there is no candidate-scale shuffle here: the
threshold filter shrinks the ~2B raw candidates to the true-pair set
BEFORE the distinct, so the dominant cost is the map-side JVM fold —
disk-safe by construction (PERF.md r16 #3).

Usage: python scripts/r16_200k_neardup_wall.py OUT.json [N]
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
    app_name="abr-200k-neardup-wall",
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
nt = similarity.lsh_tables_checked(
    nq.NEARDUP_LSH_T_BY_B, nb, max_tables=nq.NEARDUP_LSH_MAX_TABLES
)
print(f"n={n} b={nb} T={nt}", flush=True)

t0 = time.time()
pairs = similarity.cosine_neardup_lsh_verified(
    emb, "vec_id", "embedding",
    threshold=nq.COSINE_DUP_THRESHOLD,
    n_planes=nb, n_tables=nt, dim=nq.EMB_DIM,
    probe_bits=nq.NEARDUP_LSH_PROBE_BITS,
)
pairs.write.format("noop").mode("overwrite").save()
wall = round(time.time() - t0, 2)
n_pairs = pairs.count()

out = {
    "n_vectors": n, "derived_planes": nb, "n_tables": nt,
    "probe_bits": nq.NEARDUP_LSH_PROBE_BITS,
    "n_pairs": n_pairs, "wall_sec": wall,
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

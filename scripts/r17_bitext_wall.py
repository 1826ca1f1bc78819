"""r17: bitext LSH miner WALL at the ADAPTIVE probe plan — the
companion to the r16_200k_bitext_wall.py re-run (which pins the r16
clamped config (T=32, Hamming-1) for the byte-identity + GEMM-speedup
comparison).  This times the configuration `bitext_margin_mining_lsh`
actually derives now: past b=10 the plan escalates to Hamming-<=2
with its certified table count (b=12 at 100k/side -> T=13, pb=2 —
fewer tables AND a met recall target where r16 ran clamped).

Usage: python scripts/r17_bitext_wall.py OUT.json [N]
(N = total fixture rows; sides split by vec_id parity)
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
    app_name="abr-r17-bitext-wall",
    master="local[32]",
    shuffle_partitions=64,
    extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(path)
src = emb.filter(F.col("vec_id") % 2 == 0)
tgt = emb.filter(F.col("vec_id") % 2 == 1)
n_tgt = tgt.count()
nb = similarity.lsh_planes_for(
    n_tgt, nq.BITEXT_LSH_OCC,
    min_planes=nq.BITEXT_LSH_MIN_PLANES, max_planes=nq.BITEXT_LSH_MAX_PLANES,
)
nt, npb = similarity.lsh_plan_checked(nq.BITEXT_LSH_PLAN, nb)
print(f"n_tgt={n_tgt} b={nb} T={nt} pb={npb}", flush=True)

t0 = time.time()
pairs = similarity.margin_bitext_pairs_lsh(
    src, tgt, "vec_id", "embedding",
    k=nq.BITEXT_K, margin_threshold=nq.BITEXT_MARGIN,
    n_planes=nb, n_tables=nt, dim=nq.EMB_DIM,
    probe_bits=npb,
)
n_pairs = pairs.count()
wall = round(time.time() - t0, 2)

out = {
    "n_tgt": n_tgt, "derived_planes": nb, "n_tables": nt,
    "probe_bits": npb,
    "n_mined_pairs": n_pairs, "wall_sec": wall,
    "note": "adaptive certified config; exact arm infeasible at this decade",
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

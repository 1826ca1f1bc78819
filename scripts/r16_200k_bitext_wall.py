"""r16: bitext LSH miner WALL at the third decade (200k vectors,
100k per side) — cost-only: the exact margin arm is a 10B-pair
cross join (~27h extrapolated from the 966s/100M-pair sf1 point),
which is exactly why recall at this decade is certified by the
closed-form capacity model (validated against measurement in
SF10_NEARDUP_R16.json) rather than by an exact replay.

MEASURED LIMIT of local mode (recorded in PERF.md r16): at N=200k
(100k per side) the pre-margin candidate set — ~1B raw rows through
a distinct and the two mutual-rank window sorts — exceeds this box's
~80 GB spill disk (SparkOutOfMemoryError: No space left on device in
the sorter spill).  That is a cluster-shaped shuffle (partitioned by
src_id/tgt_id, no driver collect, no broadcast of either corpus), so
at 1000 executors it is routine; locally the probe runs at N=100k.

Usage: python scripts/r16_200k_bitext_wall.py OUT.json [N]
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

N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
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
    app_name="abr-200k-bitext",
    master="local[32]",
    shuffle_partitions=64,
    extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(os.path.join(EMB_DIR, "embeddings.parquet"))
src = emb.filter(F.col("vec_id") % 2 == 0)
tgt = emb.filter(F.col("vec_id") % 2 == 1)
n_tgt = tgt.count()
nb = similarity.lsh_planes_for(
    n_tgt, nq.BITEXT_LSH_OCC,
    min_planes=nq.BITEXT_LSH_MIN_PLANES, max_planes=nq.BITEXT_LSH_MAX_PLANES,
)
nt = nq.BITEXT_LSH_T_BY_B[nb]
print(f"n_tgt={n_tgt} b={nb} T={nt}", flush=True)

t0 = time.time()
pairs = similarity.margin_bitext_pairs_lsh(
    src, tgt, "vec_id", "embedding",
    k=nq.BITEXT_K, margin_threshold=nq.BITEXT_MARGIN,
    n_planes=nb, n_tables=nt, dim=nq.EMB_DIM,
    probe_bits=nq.BITEXT_LSH_PROBE_BITS,
)
n_pairs = pairs.count()
wall = round(time.time() - t0, 2)

out = {
    "n_tgt": n_tgt, "derived_planes": nb, "n_tables": nt,
    "probe_bits": nq.BITEXT_LSH_PROBE_BITS,
    "n_mined_pairs": n_pairs, "wall_sec": wall,
    "note": "cost-only: exact arm infeasible at this decade by design",
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

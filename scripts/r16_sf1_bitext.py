"""r16: bitext-mining recall AT SCALE (gen sf1, 20k vectors, 10k per
side) for the sign-LSH multiprobe miner — FULL exact arm, no
sampling: the exact margin tier at this scale is a 100M-pair scored
cross join through the two mutual-rank windows (~2.4 GB shuffle),
feasible as a one-shot audit harness on local[32] (it is exactly the
quadratic tier the LSH miner exists to avoid running per-batch at
100 TB).

Usage: python scripts/r16_sf1_bitext.py OUT.json [SF_DIR]
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from amazon_books_review_spark import session
from amazon_books_review_spark.functions import similarity
from amazon_books_review_spark.plans import northstar_queries as nq

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/abr_gen_sf1"

spark = session.get_session(
    app_name="abr-sf1-bitext",
    master="local[32]",
    shuffle_partitions=32,
    extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
)
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
exact = nq.bitext_margin_mining(spark, SF_DIR).select("src_id", "tgt_id")
exact.persist()
n_exact = exact.count()
exact_sec = round(time.time() - t0, 2)
print(f"exact pairs={n_exact} in {exact_sec}s", flush=True)

t0 = time.time()
lsh = nq.bitext_margin_mining_lsh(spark, SF_DIR).select("src_id", "tgt_id")
lsh.persist()
n_lsh = lsh.count()
n_hit = exact.join(lsh, ["src_id", "tgt_id"]).count()
lsh_sec = round(time.time() - t0, 2)

n_tgt = (
    spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    .filter("vec_id % 2 = 1")
    .count()
)
nb = similarity.lsh_planes_for(
    n_tgt, nq.BITEXT_LSH_OCC,
    min_planes=nq.BITEXT_LSH_MIN_PLANES,
    max_planes=nq.BITEXT_LSH_MAX_PLANES,
)
out = {
    "sf_dir": SF_DIR, "n_tgt": n_tgt, "derived_planes": nb,
    "n_tables": nq.BITEXT_LSH_T_BY_B[nb],
    "probe_bits": nq.BITEXT_LSH_PROBE_BITS,
    "n_exact": n_exact, "n_lsh": n_lsh, "n_hit": n_hit,
    "recall_pct": round(100 * n_hit / max(1, n_exact), 1),
    "precision_pct": round(100 * n_hit / max(1, n_lsh), 1),
    "exact_arm_sec": exact_sec, "lsh_arm_sec": lsh_sec,
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

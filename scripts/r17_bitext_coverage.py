"""r17: bitext candidate-COVERAGE audit at wall decades.

Past sf1 the bitext exact margin arm is infeasible by design (the
margin needs global mutual-rank windows over the full cross product),
so recall at the wall decades (50k-200k per side) is certified by the
derivation rather than replayed.  This audit measures the certified
quantity directly: the r15 decomposition proved the margin tail is
LOSSLESS on covered pairs, so tier recall == candidate coverage of
the exact pairs — and coverage IS cheaply measurable at scale for a
sampled probe stratum:

- exact arm (sampled): for the first N_SAMPLE source vectors, the
  exact top-K target neighbors by quantized cosine (one broadcast
  cross-score — 2000 x n_tgt, linear in the corpus);
- candidate arm: the entry's own scheme at the derived (b, T, pb) —
  symmetric radius-1 signature explode on both sides, (table, sig)
  bucket co-membership, NO vectors shipped (coverage needs ids only);
- coverage_pct = |top-K pairs that are candidates| / |top-K pairs|.

Top-K exact neighbors run at similarity >= the miner's design point
(0.5) on these corpora, so measured coverage should meet or beat the
derivation target (85 + margin 7); a shortfall would falsify the
certification where the full recall audit cannot run.

Usage: python scripts/r17_bitext_coverage.py OUT.json [N]
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

from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_books_review_spark import session
from amazon_books_review_spark.functions import similarity
from amazon_books_review_spark.plans import northstar_queries as nq

N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
N_SAMPLE = 2000
K_COV = nq.BITEXT_K
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
    app_name="abr-r17-bitext-coverage",
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

# exact arm: top-K targets per sampled src by quantized cosine
sml = src.filter(F.col("vec_id") < 2 * N_SAMPLE)
sa = sml.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("ea"))
ta = tgt.select(
    F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("eb")
).repartition(64)
dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
nrm = "sqrt(aggregate({c}, 0D, (a, v) -> a + v * v))"
t0 = time.time()
scored = (
    ta.crossJoin(F.broadcast(sa))
    .withColumn(
        "cos_q",
        F.floor(
            F.expr(dot)
            / (F.expr(nrm.format(c="ea")) * F.expr(nrm.format(c="eb")))
            * F.lit(1e6) + F.lit(0.5)
        ).cast("long"),
    )
    .select("src_id", "tgt_id", "cos_q")
)
w = Window.partitionBy("src_id").orderBy(
    F.col("cos_q").desc(), F.col("tgt_id").asc()
)
topk = (
    scored.withColumn("rank", F.row_number().over(w))
    .filter(F.col("rank") <= K_COV)
    .select("src_id", "tgt_id", "cos_q")
)
topk.persist()
n_topk = topk.count()
mean_cos_q = topk.agg(F.avg("cos_q")).collect()[0][0]
exact_sec = round(time.time() - t0, 2)
print(f"exact top-{K_COV}: {n_topk} pairs, mean cos_q {mean_cos_q:.0f},"
      f" {exact_sec}s", flush=True)

# candidate arm: the entry's own scheme, ids only (no vectors)
t0 = time.time()
sig_s = similarity.lsh_signatures(
    sml, "vec_id", "src_id", "embedding", nb, nt, nq.EMB_DIM
)
sig_t = similarity.lsh_signatures(
    tgt, "vec_id", "tgt_id", "embedding", nb, nt, nq.EMB_DIM
)
if npb == 2:
    sig_s = similarity.hamming1_probes(sig_s, nb)
    sig_t = similarity.hamming1_probes(sig_t, nb)
elif npb == 1:
    sig_s = similarity.hamming1_probes(sig_s, nb)
cand = (
    sig_s.join(sig_t, ["table_id", "sig"])
    .select("src_id", "tgt_id")
    .distinct()
)
n_hit = topk.join(cand, ["src_id", "tgt_id"]).count()
cand_sec = round(time.time() - t0, 2)

out = {
    "n_tgt": n_tgt, "derived_planes": nb, "n_tables": nt,
    "probe_bits": npb,
    "n_sample_src": N_SAMPLE, "k": K_COV,
    "n_topk_pairs": n_topk, "n_covered": n_hit,
    "coverage_pct": round(100 * n_hit / max(1, n_topk), 1),
    "mean_topk_cos_q": round(mean_cos_q),
    "exact_arm_sec": exact_sec, "candidate_arm_sec": cand_sec,
    "seed": SEED,
    "note": "margin tail lossless on covered pairs (r15 decomposition)"
            " => tier recall == candidate coverage",
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

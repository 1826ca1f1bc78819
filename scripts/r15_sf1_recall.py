"""r15: near-dup recall AT SCALE (gen sf1, 20k vectors, derived 10
planes) via a SAMPLED exact arm — exact pairs restricted to those
touching the first N_SAMPLE vec_ids (unbiased recall estimate over
that stratum; the full triangular arm is the quadratic audit harness
the sample exists to avoid)."""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from amazon_books_review_spark import session
from amazon_books_review_spark.functions import similarity
from amazon_books_review_spark.plans import northstar_queries as nq

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/abr_gen_sf1"
N_SAMPLE = 2000

spark = session.get_session(
    app_name="abr-sf1-recall",
    master="local[32]",
    shuffle_partitions=32,
    extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
)
emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
n = emb.count()
nb = similarity.lsh_planes_for(
    n, nq.NEARDUP_LSH_OCC,
    min_planes=nq.NEARDUP_LSH_MIN_PLANES, max_planes=nq.NEARDUP_LSH_MAX_PLANES,
)
nt = nq.NEARDUP_LSH_T_BY_B[nb]
print(f"n={n} derived planes={nb} tables={nt} probe_bits={nq.NEARDUP_LSH_PROBE_BITS}", flush=True)

# exact arm, sampled: pairs (a, b) with a < b and min(a, b) < N_SAMPLE
sml = emb.filter(F.col("vec_id") < N_SAMPLE)
va = sml.select(
    F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
)
vb = emb.select(
    F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
).repartition(32)  # the 40M-row BNLJ otherwise inherits 1-2 input splits
dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
nrm = "sqrt(aggregate({c}, 0D, (a, v) -> a + v * v))"
t0 = time.time()
exact = (
    va.crossJoin(vb)
    .filter(F.col("id_a") != F.col("id_b"))
    .withColumn("lo", F.least("id_a", "id_b"))
    .withColumn("hi", F.greatest("id_a", "id_b"))
    .filter(F.col("id_a") == F.col("lo"))  # each pair once, a < b form
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
lsh_sampled = lsh.filter(F.col("id_a") < N_SAMPLE)  # id_a = min by construction
n_hit = exact.join(lsh_sampled, ["id_a", "id_b"]).count()
lsh_sec = round(time.time() - t0, 2)

out = {
    "sf_dir": SF_DIR, "n_vectors": n, "derived_planes": nb,
    "n_tables": nt, "probe_bits": nq.NEARDUP_LSH_PROBE_BITS,
    "n_sample_probes": N_SAMPLE,
    "n_exact_sampled": n_exact, "n_hit": n_hit,
    "recall_pct": round(100 * n_hit / max(1, n_exact), 1),
    "exact_arm_sec": exact_sec, "lsh_arm_sec": lsh_sec,
}
print(out, flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)

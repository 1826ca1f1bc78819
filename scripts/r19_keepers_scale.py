"""r19 follow-up: decade measurement of the SemDeDup KEEPER POLICY
(`embedding_semdedup_keepers`) on the seeded fixtures — the one r19
shippable whose scale story stopped at gen-sf1 (51.9 s post-switch).

The entry composes over `embedding_semdedup_certified` (the
production semantic-dedup tier, decade-measured in
SF10/25/50_SEMDEDUP_R19), so two walls are timed in the SAME session:

- ``clusters_sec``: the certified cluster assignment alone — a
  same-session, same-box baseline replicating the committed decade
  artifact's composition (pairs -> mutual rank/count -> star
  components).
- ``keepers_total_sec``: the catalog entry end-to-end (it re-runs the
  certified tier internally — catalog entries are self-contained by
  contract).  ``keeper_marginal_sec = total - clusters`` is the
  naive marginal; it is CONFOUNDED by session warm-up (stage B
  always rides the JVM/codegen/file-listing stage A paid for) and
  measured NEGATIVE at every decade.
- ``clusters_warm_sec``: the certified tier a THIRD time, warm like
  stage B — ``keeper_marginal_warm_sec = keepers_total_sec -
  clusters_warm_sec`` is the deconfounded policy cost (warm vs
  warm): one norm projection of the embeddings scan, one vec_id
  equi-join, two windows over one (cluster_id) partitioning.

Keeper-rule audit, independent of Spark: the FULL output (narrow
rows: vec_id, cluster_id, kept_vec_id) is replayed in numpy against
the fixture's parquet — expected keeper per cluster = min vec_id
among members attaining the round-6-max L2 norm ((norm_q DESC,
vec_id ASC) window rule).  On these fixtures vectors are unit-
normalized, so round-6 norms are degenerate at 1.0 and the audit
exercises the TIE path (keeper = min member id) across every
cluster — the adversarial case for the (rank, max-over-partition)
window pair.  Also asserted: exactly one keep flag per cluster, and
a consistent kept_vec_id across each cluster's members.

Star-component skew note (why the wall is worth measuring): at
threshold 0.45 the seeded gaussian corpus chains into a few dozen
giant components (52 clusters / 198.5k members at 200k), so the
keeper windows see the pathological partition shape — a handful of
cluster_id keys carrying ~all rows.

Usage: python scripts/r19_keepers_scale.py OUT.json [N]
"""
import json
import os
import shutil
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from amazon_books_review_spark import session
from amazon_books_review_spark.plans import northstar_queries as nq

N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
EMB_DIR = f"/tmp/abr_emb_{N}"
path = os.path.join(EMB_DIR, "embeddings.parquet")
if not os.path.exists(path):
    raise SystemExit(
        f"fixture {path} absent — run scripts/r19_semdedup_scale.py "
        f"(or the r17 near-dup scale script) for N={N} first"
    )

_free0 = shutil.disk_usage("/tmp").free
_min_free = [_free0]
_stop = threading.Event()


def _poll():
    while not _stop.is_set():
        _min_free[0] = min(_min_free[0], shutil.disk_usage("/tmp").free)
        _stop.wait(2.0)


threading.Thread(target=_poll, daemon=True).start()

spark = session.get_session(
    app_name="abr-r19-keepers-scale",
    master="local[32]",
    shuffle_partitions=64,
    extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "48g"},
)
spark.sparkContext.setLogLevel("ERROR")

results = {"n_vectors": N, "k": nq.TOPK_K,
           "threshold": nq.COSINE_DUP_THRESHOLD, "seed": 4242}

# ------------------------------------------- stage A: certified baseline
t0 = time.time()
clusters = nq.embedding_semdedup_certified(spark, EMB_DIR)
clusters.persist()
n_members = clusters.count()
n_clusters = clusters.select("cluster_id").distinct().count()
results["clusters_sec"] = round(time.time() - t0, 2)
results["clustered_vectors"] = n_members
results["n_clusters"] = n_clusters
clusters.unpersist()

# ------------------------------------------- stage B: the keepers entry
t0 = time.time()
keepers = nq.embedding_semdedup_keepers(spark, EMB_DIR)
keepers.persist()
n_rows = keepers.count()
results["keepers_total_sec"] = round(time.time() - t0, 2)
results["keeper_marginal_sec"] = round(
    results["keepers_total_sec"] - results["clusters_sec"], 2
)
# -------------------------------- stage C: certified again, WARM
# (same warmness class as stage B — the deconfounded baseline)
t0 = time.time()
cw = nq.embedding_semdedup_certified(spark, EMB_DIR)
cw.persist()
assert cw.count() == n_members
results["clusters_warm_sec"] = round(time.time() - t0, 2)
results["keeper_marginal_warm_sec"] = round(
    results["keepers_total_sec"] - results["clusters_warm_sec"], 2
)
cw.unpersist()

n_keep = keepers.filter(F.col("keep")).count()
results["output_rows"] = n_rows
results["n_keepers"] = n_keep
results["survivors"] = n_keep + (N - n_rows)  # keepers + singletons
results["dedup_ratio_pct"] = round(100.0 * (N - results["survivors"]) / N, 2)

# ---------------------------------------- numpy keeper-rule replica
out = keepers.select("vec_id", "cluster_id", "kept_vec_id").toPandas()
_stop.set()
vid = out["vec_id"].to_numpy()
cid = out["cluster_id"].to_numpy()
kept = out["kept_vec_id"].to_numpy()

tbl = pq.read_table(path, columns=["vec_id", "embedding"])
ids_all = tbl["vec_id"].to_numpy()
assert (ids_all == np.arange(N)).all()
V = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32)
norm_q = np.round(np.linalg.norm(V.astype(np.float64), axis=1), 6)

# per-cluster expected keeper under (norm_q DESC, vec_id ASC):
# lexsort is last-key-major — order by (cid, -norm, vid)
order = np.lexsort((vid, -norm_q[vid], cid))
cs, vs = cid[order], vid[order]
first = np.ones(len(cs), dtype=bool)
first[1:] = cs[1:] != cs[:-1]
expected = dict(zip(cs[first].tolist(), vs[first].tolist()))

mismatch_keeper = int(sum(expected[c] != k for c, k in zip(cid, kept)))
# one kept id per cluster (consistency across members)
per_cluster_kept = {}
inconsistent = 0
for c, k in zip(cid.tolist(), kept.tolist()):
    prev = per_cluster_kept.setdefault(c, k)
    if prev != k:
        inconsistent += 1
results["keeper_rule_mismatches"] = mismatch_keeper
results["inconsistent_kept_rows"] = inconsistent
results["one_keep_per_cluster"] = bool(n_keep == n_clusters)
results["distinct_norm_q_values"] = int(len(np.unique(norm_q[vid])))
results["peak_extra_disk_gb"] = round((_free0 - _min_free[0]) / 1e9, 2)

print(json.dumps(results, indent=1), flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(results, f, indent=1)
